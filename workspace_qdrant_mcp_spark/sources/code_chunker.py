"""Semantic code chunking (S3 code path) — the Spark-first analog of the
reference's tree-sitter chunker (tree_sitter/chunker/mod.rs:27-60,
strategy.rs:19-56, splitting.rs:28-120).

The reference parses each file with a language grammar, emits one chunk
per semantic unit (function/class per YAML patterns), splits oversized
units into overlapping fragments, and falls back to text chunking for
unsupported languages. Without a native parser runtime, the semantic
boundary here is a LINE-ANCHORED definition pattern per language — the
same unit granularity for the common top-level-definition case, fully
declarative:

  lines → boundary flag (rlike) → unit id (running sum window) →
  group-concat per unit → oversized units fragment with overlap
  (exact formula of sources.documents.chunk_text) → global chunk index.

Every step is a JVM column expression or window — a narrow map + one
partial shuffle per file key, no Python in the path; at 100 TB this is
scan-shaped. Nested definitions are emitted as separate child chunks
when `nest_mode` is set: 'indent' detects child definitions by
indentation depth (Python-style languages), 'brace' by brace-nesting
depth (C/Java/JS-style); both mirror tree-sitter's per-unit emission
(strategy.rs:19-56). nest_mode=None keeps the flat top-level-only
behavior for callers that want the reference's fallback granularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# tokens→chars approximation is 4x (splitting.rs:54); the reference's
# default 8000-token cap is 32000 chars. Overlap mirrors FRAGMENT_OVERLAP.
MAX_UNIT_CHARS = 32000
FRAGMENT_OVERLAP = 500

# Top-level definition anchors per language — the line-anchored analog of
# the reference's language_registry.yaml semantic_patterns (one entry per
# registry language; language_registry.yaml lists 45). Capture group 1 =
# symbol name. RE2-safe (no lookbehind/backrefs) so the same pattern runs
# in Spark's Java regex and DuckDB.
BOUNDARY_PATTERNS: dict[str, str] = {
    "ada": r"(?i)^(?:procedure|function|package(?: body)?) +([A-Za-z_][A-Za-z0-9_.]*)",
    "bash": r"^(?:function +)?([A-Za-z_][A-Za-z0-9_]*) *\(\) *\{",
    "c": r"^(?:typedef struct |struct |enum |union |(?:static |inline |extern )*[A-Za-z_][A-Za-z0-9_ *]* \**)([A-Za-z_][A-Za-z0-9_]*) *[({]",
    "c-sharp": r"^(?:(?:public|private|protected|internal|static|sealed|abstract|partial) )*(?:class|struct|interface|enum|namespace|record) +([A-Za-z_][A-Za-z0-9_.]*)",
    "clojure": r"^\(def[a-z-]* +\^?([A-Za-z_*+!?<>=/.-][A-Za-z0-9_*+!?<>=/.-]*)",
    "cpp": r"^(?:template<[^>]*> *)?(?:class |struct |enum(?: class)? |namespace |(?:static |inline |extern |constexpr |virtual )*[A-Za-z_][A-Za-z0-9_:<>, *&]* \**)([A-Za-z_][A-Za-z0-9_:]*) *[({:]",
    "dart": r"^(?:abstract )?(?:class|enum|mixin|extension) +([A-Za-z_][A-Za-z0-9_]*)",
    "elixir": r"^defmodule +([A-Za-z_][A-Za-z0-9_.]*)",
    "elm": r"^(?:type(?: alias)? +|port +|module +)([A-Za-z_][A-Za-z0-9_.]*)",
    "erlang": r"^([a-z][A-Za-z0-9_]*)\([^)]*\) *->",
    "fortran": r"(?i)^ *(?:subroutine|module|program|(?:[a-z(),*0-9 ]+ )?function) +([A-Za-z_][A-Za-z0-9_]*)",
    "go": r"^(?:func(?: \([^)]*\))? |type )([A-Za-z_][A-Za-z0-9_]*)",
    "haskell": r"^(?:data |newtype |class |instance |module |type )([A-Za-z_'][A-Za-z0-9_'.]*)",
    "java": r"^(?:(?:public|private|protected|static|final|abstract|sealed) )*(?:class|interface|enum|record) +([A-Za-z_][A-Za-z0-9_]*)",
    "javascript": r"^(?:export )?(?:default )?(?:async )?(?:function\*? |class )([A-Za-z_$][A-Za-z0-9_$]*)",
    "julia": r"^(?:function|macro|(?:mutable )?struct|module|abstract type) +([A-Za-z_!][A-Za-z0-9_!]*)",
    "kotlin": r"^(?:(?:data|sealed|enum|open|abstract|annotation|inner) )*(?:class|fun|object|interface) +([A-Za-z_][A-Za-z0-9_]*)",
    "lisp": r"^\(def[a-z-]* +\(? *([A-Za-z_*+!?<>=/.-][A-Za-z0-9_*+!?<>=/.-]*)",
    "lua": r"^(?:local )?function +([A-Za-z_][A-Za-z0-9_.:]*)",
    "ocaml": r"^(?:let(?: rec)? |module |type )([A-Za-z_][A-Za-z0-9_']*)",
    "odin": r"^([A-Za-z_][A-Za-z0-9_]*) *:: *(?:proc|struct|enum|union)",
    "pascal": r"(?i)^(?:procedure|function|unit|program|constructor|destructor) +([A-Za-z_][A-Za-z0-9_.]*)",
    "perl": r"^(?:sub|package) +([A-Za-z_][A-Za-z0-9_:]*)",
    "php": r"^(?:(?:abstract|final) )?(?:class|interface|trait|function) +([A-Za-z_][A-Za-z0-9_]*)",
    "python": r"^(?:async def |def |class )([A-Za-z_][A-Za-z0-9_]*)",
    "r": r"^([A-Za-z_.][A-Za-z0-9_.]*) *(?:<-|=) *function",
    "ruby": r"^(?:def |class |module )(?:self\.)?([A-Za-z_][A-Za-z0-9_.?!]*)",
    "rust": r"^(?:pub(?:\([a-z]+\))? )?(?:fn |struct |enum |trait |impl(?:<[^>]*>)? |mod |macro_rules! )([A-Za-z_][A-Za-z0-9_]*)",
    "scala": r"^(?:(?:final|abstract|case|sealed|implicit) )*(?:class|object|trait|def) +([A-Za-z_][A-Za-z0-9_]*)",
    "scheme": r"^\(define[a-z-]* +\(? *([A-Za-z_*+!?<>=/.-][A-Za-z0-9_*+!?<>=/.-]*)",
    "sql": r"(?i)^create +(?:or replace +)?(?:table|view|function|procedure|index|schema) +(?:if not exists +)?([A-Za-z_][A-Za-z0-9_.\"]*)",
    "swift": r"^(?:(?:public|private|internal|open|final|static) )*(?:func|class|struct|enum|protocol|extension) +([A-Za-z_][A-Za-z0-9_]*)",
    "tsx": r"^(?:export )?(?:default )?(?:async )?(?:function\*? |class |interface |enum |type |const )([A-Za-z_$][A-Za-z0-9_$]*)",
    "typescript": r"^(?:export )?(?:default )?(?:async )?(?:function\*? |class |interface |enum |type |namespace )([A-Za-z_$][A-Za-z0-9_$]*)",
    "vala": r"^(?:(?:public|private) )*(?:class|interface|struct|enum|namespace) +([A-Za-z_][A-Za-z0-9_.]*)",
    "zig": r"^(?:pub )?(?:export )?(?:fn|const) +([A-Za-z_][A-Za-z0-9_]*)",
}

# Registry languages with no line-anchored definition concept — data /
# markup formats degrade to text chunking (mod.rs text_chunk_fallback),
# matching semantic_chunk's no-boundary module-unit path.
TEXT_FALLBACK_LANGUAGES = frozenset(
    {"css", "html", "json", "latex", "markdown", "nix", "toml", "vue", "yaml"}
)

# language_extensions.yaml analog: file extension → registry language for
# the languages with boundary patterns.
EXTENSION_MAP: dict[str, str] = {
    ".adb": "ada", ".ads": "ada", ".sh": "bash", ".bash": "bash",
    ".c": "c", ".h": "c", ".cs": "c-sharp", ".clj": "clojure",
    ".cc": "cpp", ".cpp": "cpp", ".cxx": "cpp", ".hpp": "cpp",
    ".dart": "dart", ".ex": "elixir", ".exs": "elixir", ".elm": "elm",
    ".erl": "erlang", ".f90": "fortran", ".f95": "fortran", ".go": "go",
    ".hs": "haskell", ".java": "java", ".js": "javascript",
    ".mjs": "javascript", ".jl": "julia", ".kt": "kotlin", ".lisp": "lisp",
    ".el": "lisp", ".lua": "lua", ".ml": "ocaml", ".mli": "ocaml",
    ".odin": "odin", ".pas": "pascal", ".pl": "perl", ".pm": "perl",
    ".php": "php", ".py": "python", ".pyi": "python", ".r": "r",
    ".rb": "ruby", ".rs": "rust", ".scala": "scala", ".scm": "scheme",
    ".sql": "sql", ".swift": "swift", ".tsx": "tsx", ".ts": "typescript",
    ".vala": "vala", ".zig": "zig",
}


def language_for_path(path: str) -> str | None:
    """Registry language for a file path, None for unknown/fallback
    extensions (caller routes those to text chunking)."""
    dot = path.rfind(".")
    if dot < 0:
        return None
    return EXTENSION_MAP.get(path[dot:].lower())


CLASS_KEYWORDS = (
    "class ", "struct ", "enum ", "trait ", "impl ", "type ", "interface ",
    "module ", "object ", "record ", "protocol ", "namespace ", "mixin ",
    "union ", "defmodule ", "package ",
)
# modifier prefixes that may precede a class-ish keyword on the def line
_CLASS_PREFIX = (
    r"(?:(?:pub(?:\([a-z]+\))?|export|public|private|protected|internal|"
    r"static|final|abstract|sealed|open|case|data|mutable|partial|"
    r"annotation|inner|implicit|typedef|local|abstract) )*"
)


def class_line_re() -> str:
    """Regex deciding unit_type 'class' from a boundary line — shared by
    the Spark expression and the DuckDB oracle."""
    return "^" + _CLASS_PREFIX + "(?:" + "|".join(k.strip() for k in CLASS_KEYWORDS) + r")\b"


def semantic_chunk(
    files: DataFrame,
    language: str = "python",
    max_chars: int = MAX_UNIT_CHARS,
    overlap: int = FRAGMENT_OVERLAP,
    id_cols: tuple[str, ...] = ("tenant_id", "file_path"),
    text_col: str = "content",
    nested: bool = False,
    nest_mode: str = "indent",
) -> DataFrame:
    """(id_cols..., chunk_index, unit_index, fragment_index, symbol,
    unit_type, content, start_line, end_line[, parent_unit_id]) — one row
    per chunk.

    unit 0 with no boundary line is the module preamble (unit_type
    'module', empty symbol); boundary units are 'class' for
    class/struct/enum/trait/impl/type anchors, else 'function'. Files
    with no boundaries degrade to one module unit = text-chunk fallback
    (mod.rs text_chunk_fallback stance).

    With nested=True (indent-structured languages), INDENTED definition
    lines also open units — the tree-sitter behavior of emitting nested
    definitions as separate chunks (tree_sitter/chunker/strategy.rs:
    19-56) — and each boundary unit carries parent_unit_id: the nearest
    earlier unit at strictly shallower depth (NULL for top level). The
    parent resolution is a per-file self-join over the (tiny) unit
    table — max earlier unit_index among shallower units — which is the
    relational form of the enclosing-scope stack; the default output is
    byte-identical to nested=False.

    nest_mode picks the depth measure: 'indent' (leading spaces — right
    for indent languages and conventionally-formatted brace code) or
    'brace' (running {}-balance at the boundary line's start — right for
    brace languages regardless of formatting; braces inside string
    literals are miscounted, a documented approximation tree-sitter
    would resolve)."""
    pattern = BOUNDARY_PATTERNS[language]
    ids = [F.col(c) for c in id_cols]
    lines = files.select(
        *ids, F.posexplode(F.split(F.col(text_col), "\n")).alias("idx", "line")
    )
    boundary_src = (
        F.ltrim(F.col("line")) if nested else F.col("line")
    )
    w = Window.partitionBy(*id_cols).orderBy("idx")
    lines = lines.withColumn(
        "unit_index",
        F.sum(F.when(boundary_src.rlike(pattern), 1).otherwise(0)).over(w),
    )
    if nested:
        if nest_mode == "brace":
            net = F.length(
                F.regexp_replace(F.col("line"), "[^{]", "")
            ) - F.length(F.regexp_replace(F.col("line"), "[^}]", ""))
            wprev = (
                Window.partitionBy(*id_cols)
                .orderBy("idx")
                .rowsBetween(Window.unboundedPreceding, -1)
            )
            depth0 = F.coalesce(F.sum(net).over(wprev), F.lit(0))
        else:
            depth0 = F.length(F.regexp_extract(F.col("line"), "^ *", 0))
        lines = lines.withColumn("depth0", depth0)
    unit_aggs = [
        F.min("idx").alias("start_line"),
        F.max("idx").alias("end_line"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("idx"), F.col("line")))
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("unit_text"),
        F.min_by("line", "idx").alias("first_line"),
    ]
    if nested:
        unit_aggs.append(F.min_by("depth0", "idx").alias("unit_depth_raw"))
    units = lines.groupBy(*id_cols, "unit_index").agg(*unit_aggs)
    fl = F.ltrim(F.col("first_line")) if nested else F.col("first_line")
    units = units.withColumn(
        "symbol", F.regexp_extract(fl, pattern, 1)
    ).withColumn(
        "unit_type",
        F.when(F.col("symbol") == "", F.lit("module")).otherwise(
            F.when(fl.rlike(class_line_re()), F.lit("class")).otherwise(
                F.lit("function")
            )
        ),
    )
    if nested:
        units = units.withColumn(
            "unit_indent",
            F.when(
                F.col("unit_type") == "module", F.lit(-1)
            ).otherwise(F.col("unit_depth_raw")),
        ).drop("unit_depth_raw")
        cu = units.alias("cu")
        bp = (
            units.filter(F.col("unit_type") != "module")
            .select(
                *ids,
                F.col("unit_index").alias("p_index"),
                F.col("unit_indent").alias("p_indent"),
            )
            .alias("bp")
        )
        on = (F.col("bp.p_index") < F.col("cu.unit_index")) & (
            F.col("bp.p_indent") < F.col("cu.unit_indent")
        )
        for c in id_cols:
            on = on & (F.col(f"bp.{c}") == F.col(f"cu.{c}"))
        keep = [
            *(F.col(f"cu.{c}") for c in id_cols),
            F.col("cu.unit_index").alias("unit_index"),
            F.col("cu.start_line").alias("start_line"),
            F.col("cu.end_line").alias("end_line"),
            F.col("cu.unit_text").alias("unit_text"),
            F.col("cu.first_line").alias("first_line"),
            F.col("cu.symbol").alias("symbol"),
            F.col("cu.unit_type").alias("unit_type"),
            F.col("cu.unit_indent").alias("unit_indent"),
        ]
        units = (
            cu.join(bp, on, "left")
            .groupBy(*keep)
            .agg(F.max("bp.p_index").cast("int").alias("parent_unit_id"))
        )
    # oversized-unit fragmentation: exact chunk_text formula
    stride = max_chars - overlap
    n = F.length("unit_text")
    n_frags = F.greatest(
        F.lit(1), F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int")
    )
    extra = ["parent_unit_id"] if nested else []
    frags = units.select(
        *ids,
        "unit_index",
        "symbol",
        "unit_type",
        "start_line",
        "end_line",
        *extra,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_frags - 1),
                lambda i: F.substring(F.col("unit_text"), i * stride + 1, max_chars),
            )
        ).alias("fragment_index", "content"),
    )
    wo = Window.partitionBy(*id_cols).orderBy("unit_index", "fragment_index")
    return frags.withColumn(
        "chunk_index", (F.row_number().over(wo) - 1).cast("int")
    ).select(
        *id_cols,
        "chunk_index",
        F.col("unit_index").cast("int").alias("unit_index"),
        F.col("fragment_index").cast("int").alias("fragment_index"),
        "symbol",
        "unit_type",
        "content",
        F.col("start_line").cast("int").alias("start_line"),
        F.col("end_line").cast("int").alias("end_line"),
        *extra,
    )


def duckdb_semantic_chunk_sql(
    files_cte: str,
    language: str = "python",
    max_chars: int = MAX_UNIT_CHARS,
    overlap: int = FRAGMENT_OVERLAP,
    nested: bool = False,
    nest_mode: str = "indent",
) -> str:
    """Oracle CTE chain over a `{files_cte}`(tenant_id, file_path, content)
    CTE, producing the identical chunk table as :func:`semantic_chunk`
    (CTE name: sem_chunks). nested=True mirrors the nested-definition
    mode: boundaries/symbols match on the ltrimmed line, and
    parent_unit_id = max earlier boundary unit at shallower depth.
    nest_mode mirrors the Spark side: 'indent' depth = leading spaces of
    the unit's first line; 'brace' depth = running {{}}-balance over all
    PRECEDING lines at the unit's first line."""
    pattern = BOUNDARY_PATTERNS[language].replace("'", "''")
    class_re = class_line_re().replace("'", "''")
    stride = max_chars - overlap
    probe = "ltrim(line)" if nested else "line"
    fprobe = "ltrim(first_line)" if nested else "first_line"
    typed_extra = ""
    parent_ctes = ""
    typed_src = "sc_typed"
    frag_extra = ""
    out_extra = ""
    depth_line_sel = ""
    depth_group_sel = ""
    if nested and nest_mode == "brace":
        # net brace balance per line; depth at a line = sum over previous
        # lines (the Spark side's rowsBetween(unboundedPreceding, -1))
        net = (
            "length(replace(line, '}', '')) - length(replace(line, '{', ''))"
        )
        depth_line_sel = f""",
         coalesce(sum({net})
             OVER (PARTITION BY tenant_id, file_path ORDER BY idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS depth0"""
        depth_group_sel = ", arg_min(depth0, idx) AS unit_depth_raw"
        typed_extra = """,
         CASE WHEN coalesce(regexp_extract(ltrim(first_line), '{p}', 1), '') = ''
              THEN -1
              ELSE unit_depth_raw END
           AS unit_indent""".format(p=pattern)
    elif nested:
        typed_extra = """,
         CASE WHEN coalesce(regexp_extract(ltrim(first_line), '{p}', 1), '') = ''
              THEN -1
              ELSE length(regexp_extract(first_line, '^ *', 0)) END
           AS unit_indent""".format(p=pattern)
    if nested:
        parent_ctes = """,
sc_parented AS (
  SELECT u.*, CAST(max(p.unit_index) AS INT) AS parent_unit_id
  FROM sc_typed0 u
  LEFT JOIN sc_typed0 p
    ON p.tenant_id = u.tenant_id AND p.file_path = u.file_path
   AND p.unit_index < u.unit_index AND p.unit_indent < u.unit_indent
   AND p.unit_type <> 'module'
  GROUP BY ALL
)"""
        typed_src = "sc_parented"
        frag_extra = ", parent_unit_id"
        out_extra = ", parent_unit_id"
    typed_name = "sc_typed0" if nested else "sc_typed"
    return f"""
sc_lines AS (
  SELECT tenant_id, file_path, g.i - 1 AS idx, ls[g.i] AS line
  FROM (SELECT tenant_id, file_path,
               string_split(content, chr(10)) AS ls FROM {files_cte}) f,
       LATERAL (SELECT unnest(generate_series(1, len(ls))) AS i) g
),
sc_units AS (
  SELECT tenant_id, file_path,
         sum(CASE WHEN regexp_matches({probe}, '{pattern}') THEN 1 ELSE 0 END)
           OVER (PARTITION BY tenant_id, file_path ORDER BY idx) AS unit_index,
         idx, line{depth_line_sel}
  FROM sc_lines
),
sc_grouped AS (
  SELECT tenant_id, file_path, unit_index,
         min(idx) AS start_line, max(idx) AS end_line,
         string_agg(line, chr(10) ORDER BY idx) AS unit_text,
         arg_min(line, idx) AS first_line{depth_group_sel}
  FROM sc_units GROUP BY 1, 2, 3
),
{typed_name} AS (
  SELECT *,
         coalesce(regexp_extract({fprobe}, '{pattern}', 1), '') AS symbol,
         CASE WHEN coalesce(regexp_extract({fprobe}, '{pattern}', 1), '') = ''
              THEN 'module'
              WHEN regexp_matches({fprobe}, '{class_re}') THEN 'class'
              ELSE 'function' END AS unit_type{typed_extra}
  FROM sc_grouped
){parent_ctes},
sc_frags AS (
  SELECT tenant_id, file_path, unit_index, symbol, unit_type,
         start_line, end_line{frag_extra}, t.i AS fragment_index,
         substr(unit_text, t.i * {stride} + 1, {max_chars}) AS content
  FROM {typed_src},
       LATERAL unnest(generate_series(0,
         greatest(1, CAST(ceil((length(unit_text) - {overlap}) / {stride}.0) AS INT)) - 1
       )) AS t(i)
),
sem_chunks AS (
  SELECT tenant_id, file_path,
         CAST(row_number() OVER (PARTITION BY tenant_id, file_path
                                 ORDER BY unit_index, fragment_index) - 1
              AS INT) AS chunk_index,
         CAST(unit_index AS INT) AS unit_index,
         CAST(fragment_index AS INT) AS fragment_index,
         symbol, unit_type, content,
         CAST(start_line AS INT) AS start_line,
         CAST(end_line AS INT) AS end_line{out_extra}
  FROM sc_frags
)
"""
