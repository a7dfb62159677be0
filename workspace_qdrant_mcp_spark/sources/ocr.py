"""Matrix-matching OCR (S3, ocr.rs:1-119 parity slot).

The reference's OCR wraps tesseract; no OCR engine ships in this
container, so the slot was a declared stub through r11. Since r12 the
default is a REAL working pipeline for machine-rendered glyph grids —
matrix matching against a fixed 5x7 dot font, the classic pre-neural
OCR approach (the OCR-A/OCR-B era technique: binarize, segment the
fixed-pitch grid, nearest-template per cell). It decodes any image the
spec-level decoders read (netpbm / 24-bit BMP / minimal PNG / PIL when
importable), tolerates pixel noise up to half the minimum inter-glyph
Hamming distance (asserted >= 3 in tests, so any single-pixel flip per
glyph is always recovered), and emits '?' for cells it cannot place.
Scanned-document OCR (arbitrary fonts, skew, photos) remains the
env-gated engine slot: `ocr_extract(..., use_real=True)` probes for
pytesseract first and falls back to the matrix engine.

Charset: A-Z 0-9 space '.' ',' '-' ':' — renderer input is uppercased;
anything outside the charset is rejected at render time (fail-loud)
and comes back as '?' at recognition time.
"""

from __future__ import annotations

CELL_W, CELL_H = 6, 8  # 5x7 glyph + 1px gap right / below
GLYPH_W, GLYPH_H = 5, 7

# Classic 5x7 dot-matrix font. Each glyph: 7 rows of 5 cells,
# 'X' = ink. Pairwise Hamming distance >= 3 is asserted in tests
# (nearest-template decode then provably recovers any 1-pixel flip).
_FONT_ROWS: dict[str, tuple[str, ...]] = {
    "A": (".XXX.", "X...X", "X...X", "XXXXX", "X...X", "X...X", "X...X"),
    "B": ("XXXX.", "X...X", "X...X", "XXXX.", "X...X", "X...X", "XXXX."),
    "C": (".XXX.", "X...X", "X....", "X....", "X....", "X...X", ".XXX."),
    "D": ("XXX..", "X..X.", "X...X", "X...X", "X...X", "X..X.", "XXX.."),
    "E": ("XXXXX", "X....", "X....", "XXXX.", "X....", "X....", "XXXXX"),
    "F": ("XXXXX", "X....", "X....", "XXXX.", "X....", "X....", "X...."),
    "G": (".XXX.", "X...X", "X....", "X.XXX", "X...X", "X...X", ".XXXX"),
    "H": ("X...X", "X...X", "X...X", "XXXXX", "X...X", "X...X", "X...X"),
    "I": ("XXXXX", "..X..", "..X..", "..X..", "..X..", "..X..", "XXXXX"),
    "J": ("..XXX", "...X.", "...X.", "...X.", "...X.", "X..X.", ".XX.."),
    "K": ("X...X", "X..X.", "X.X..", "XX...", "X.X..", "X..X.", "X...X"),
    "L": ("X....", "X....", "X....", "X....", "X....", "X....", "XXXXX"),
    "M": ("X...X", "XX.XX", "X.X.X", "X.X.X", "X...X", "X...X", "X...X"),
    "N": ("X...X", "XX..X", "X.X.X", "X..XX", "X...X", "X...X", "X...X"),
    "O": (".XXX.", "X...X", "X...X", "X...X", "X...X", "X...X", ".XXX."),
    "P": ("XXXX.", "X...X", "X...X", "XXXX.", "X....", "X....", "X...."),
    "Q": (".XXX.", "X...X", "X...X", "X...X", "X.X.X", "X..X.", ".XX.X"),
    "R": ("XXXX.", "X...X", "X...X", "XXXX.", "X.X..", "X..X.", "X...X"),
    "S": (".XXXX", "X....", "X....", ".XXX.", "....X", "....X", "XXXX."),
    "T": ("XXXXX", "..X..", "..X..", "..X..", "..X..", "..X..", "..X.."),
    "U": ("X...X", "X...X", "X...X", "X...X", "X...X", "X...X", ".XXX."),
    "V": ("X...X", "X...X", "X...X", "X...X", "X...X", ".X.X.", "..X.."),
    "W": ("X...X", "X...X", "X...X", "X.X.X", "X.X.X", "XX.XX", "X...X"),
    "X": ("X...X", "X...X", ".X.X.", "..X..", ".X.X.", "X...X", "X...X"),
    "Y": ("X...X", "X...X", ".X.X.", "..X..", "..X..", "..X..", "..X.."),
    "Z": ("XXXXX", "....X", "...X.", "..X..", ".X...", "X....", "XXXXX"),
    "0": (".XXX.", "X...X", "X..XX", "X.X.X", "XX..X", "X...X", ".XXX."),
    "1": ("..X..", ".XX..", "..X..", "..X..", "..X..", "..X..", "XXXXX"),
    "2": (".XXX.", "X...X", "....X", "..XX.", ".X...", "X....", "XXXXX"),
    "3": ("XXXXX", "...X.", "..X..", "...X.", "....X", "X...X", ".XXX."),
    "4": ("...X.", "..XX.", ".X.X.", "X..X.", "XXXXX", "...X.", "...X."),
    "5": ("XXXXX", "X....", "XXXX.", "....X", "....X", "X...X", ".XXX."),
    "6": ("..XX.", ".X...", "X....", "XXXX.", "X...X", "X...X", ".XXX."),
    "7": ("XXXXX", "....X", "...X.", "..X..", ".X...", ".X...", ".X..."),
    "8": (".XXX.", "X...X", "X...X", ".XXX.", "X...X", "X...X", ".XXX."),
    "9": (".XXX.", "X...X", "X...X", ".XXXX", "....X", "...X.", ".XX.."),
    ".": (".....", ".....", ".....", ".....", ".....", ".XX..", ".XX.."),
    ",": (".....", ".....", ".....", ".....", ".XX..", "..X..", ".X..."),
    "-": (".....", ".....", ".....", "XXXXX", ".....", ".....", "....."),
    ":": (".....", ".XX..", ".XX..", ".....", ".XX..", ".XX..", "....."),
}


def _glyph_bits(ch: str) -> int:
    """35-bit integer mask of the glyph, row-major."""
    rows = _FONT_ROWS[ch]
    bits = 0
    for r, row in enumerate(rows):
        for c, cell in enumerate(row):
            if cell == "X":
                bits |= 1 << (r * GLYPH_W + c)
    return bits


_FONT_BITS: dict[str, int] = {ch: _glyph_bits(ch) for ch in _FONT_ROWS}


def render_text_png(text: str) -> bytes:
    """Rasterize text to a grayscale PNG (ink 0 on white 255) on the
    fixed CELL_W x CELL_H grid the matrix recognizer expects; lines split
    on newline; input uppercased; unsupported characters fail loud."""
    import numpy as np

    from .multimodal import encode_png_gray

    lines = text.upper().split("\n")
    bad = {c for ln in lines for c in ln} - set(_FONT_ROWS) - {" "}
    if bad:
        raise ValueError(
            f"render_text_png: unsupported characters {sorted(bad)!r} "
            f"(charset: A-Z 0-9 space . , - :)"
        )
    w = max((len(ln) for ln in lines), default=1) * CELL_W
    h = max(len(lines), 1) * CELL_H
    img = np.full((h, max(w, CELL_W)), 255, dtype=np.uint8)
    for r, ln in enumerate(lines):
        for c, ch in enumerate(ln):
            if ch == " ":
                continue
            for gr, row in enumerate(_FONT_ROWS[ch]):
                for gc, cell in enumerate(row):
                    if cell == "X":
                        img[r * CELL_H + gr, c * CELL_W + gc] = 0
    return encode_png_gray(img)


def ocr_matrix(payload: bytes) -> str:
    """Recognize a machine-rendered glyph grid: decode (netpbm / BMP /
    PNG / PIL), binarize at 0.5, slice the fixed-pitch grid, match each
    cell to the nearest font glyph by Hamming distance over the 35-bit
    mask. Blank cell -> space; a cell farther than ACCEPT_DIST from
    every glyph -> '?'. Trailing spaces/blank lines are stripped, so
    render_text_png -> ocr_matrix round-trips exactly."""
    import numpy as np

    from . import multimodal as mm

    data = bytes(payload)
    if data[:2] in (b"P2", b"P3", b"P5", b"P6"):
        h, w, c, px = mm._decode_netpbm(data)
    elif data[:2] == b"BM":
        h, w, c, px = mm._decode_bmp(data)
    elif data[:8] == b"\x89PNG\r\n\x1a\n":
        h, w, c, px = mm._decode_png(data)
    else:
        raise ValueError("ocr_matrix: not a decodable image container")
    gray = px.reshape(h, w, c).mean(axis=2)
    ink = gray < 0.5
    accept = 8  # > half the min inter-glyph distance; beyond it -> '?'
    out_lines = []
    for r in range(h // CELL_H):
        chars = []
        for col in range(w // CELL_W):
            cell = ink[
                r * CELL_H : r * CELL_H + GLYPH_H,
                col * CELL_W : col * CELL_W + GLYPH_W,
            ]
            bits = 0
            for gr in range(cell.shape[0]):
                for gc in range(cell.shape[1]):
                    if cell[gr, gc]:
                        bits |= 1 << (gr * GLYPH_W + gc)
            if bits == 0:
                chars.append(" ")
                continue
            best, best_d = "?", accept + 1
            for ch, mask in _FONT_BITS.items():
                d = int.bit_count(bits ^ mask)
                if d < best_d:
                    best, best_d = ch, d
            chars.append(best if best_d <= accept else "?")
        out_lines.append("".join(chars).rstrip())
    return "\n".join(out_lines).rstrip("\n")
