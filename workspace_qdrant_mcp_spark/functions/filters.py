"""Search filter predicates (SURVEY §2.2, P1-P10) as Column expressions.

Parity target: the reference builds one filter tree pushed into every
Qdrant query (client/src/qdrant/filters.rs:88-299). Here each predicate is
a Catalyst expression pushed into the parquet scan — `.explain` shows them
under PushedFilters / partition pruning, which is the Spark analog of the
reference's "filter once, push everywhere" discipline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GLOB_META = "*?[{"


def extract_glob_prefix(glob: str) -> str:
    """Deterministic literal prefix of a glob: cut at the first meta char,
    then back to the last '/' (filters.rs:65-77)."""
    cut = None
    for i, c in enumerate(glob):
        if c in GLOB_META:
            cut = i
            break
    if cut is None:
        return glob  # no metachar → whole string is literal
    before = glob[:cut]
    slash = before.rfind("/")
    return glob[: slash + 1] if slash >= 0 else ""


def glob_to_regex(glob: str) -> str:
    """Translate a path glob to an anchored regex (** crosses '/', * and ?
    do not, [...] classes pass through)."""
    out, i = [], 0
    while i < len(glob):
        c = glob[i]
        if c == "*":
            if glob[i : i + 2] == "**":
                out.append(".*")
                i += 2
                continue
            out.append("[^/]*")
        elif c == "?":
            out.append("[^/]")
        elif c == "[":
            j = glob.find("]", i)
            if j == -1:
                out.append("\\[")
            else:
                out.append(glob[i : j + 1])
                i = j
        elif c in ".^$+(){}|\\":
            out.append("\\" + c)
        else:
            out.append(c)
        i += 1
    return "^" + "".join(out) + "$"


def tenant_filter(tenant: str | list[str] | None) -> Column:
    """P1 — equality (project scope) or IN-set (group scope); partition
    pruning when the table is partitioned by tenant_id (filters.rs:187-204)."""
    if tenant is None:
        return F.lit(True)
    if isinstance(tenant, str):
        return F.col("tenant_id") == tenant
    return F.col("tenant_id").isin(tenant)


def branch_filter(branch: str | None) -> Column:
    """P2 — branches array contains; None or '*' disables
    (filters.rs:207-214, wildcard graph/mod.rs:529-534)."""
    if branch is None or branch == "*":
        return F.lit(True)
    return F.array_contains(F.col("branches"), branch)


def file_type_filter(file_type: str | None) -> Column:
    """P3 — equality (filters.rs:217-220)."""
    return F.lit(True) if file_type is None else F.col("file_type") == file_type


def library_filter(name: str | None, path_prefix: str | None = None) -> Column:
    """P4 — library_name equality / library_path text prefix
    (filters.rs:223-238)."""
    cond = F.lit(True)
    if name is not None:
        cond = cond & (F.col("library_name") == name)
    if path_prefix is not None:
        cond = cond & F.col("library_path").startswith(path_prefix)
    return cond


def tag_filter(tags: list[str] | None) -> Column:
    """P5 — OR over tags: (concept_tags has t) OR (tags has t) for any
    requested t (filters.rs:243-272)."""
    if not tags:
        return F.lit(True)
    cond = F.lit(False)
    for t in tags:
        cond = cond | F.array_contains(F.col("concept_tags"), t) | F.array_contains(
            F.col("tags"), t
        )
    return cond


def component_filter(component: str | None) -> Column:
    """P6 — exact id or dotted-prefix descendant (filters.rs:277-285)."""
    if component is None:
        return F.lit(True)
    return (F.col("component_id") == component) | F.col("component_id").startswith(
        component + "."
    )


def path_glob_filter(glob: str | None) -> Column:
    """P7 — literal prefix for pushdown + full glob verify via rlike
    (filters.rs:292-299 + extract_glob_prefix)."""
    if glob is None:
        return F.lit(True)
    prefix = extract_glob_prefix(glob)
    cond = F.col("relative_path").rlike(glob_to_regex(glob))
    if prefix:
        cond = F.col("relative_path").startswith(prefix) & cond
    return cond


def not_deleted_filter() -> Column:
    """P8 — tombstone: must_not deleted=true (filters.rs:169-175)."""
    return ~F.coalesce(F.col("deleted"), F.lit(False))


RANKING_AID_KEYS = ("dense", "sparse", "content")


def strip_metadata(df: DataFrame, keep_content: bool = False) -> DataFrame:
    """P9 — drop vectors + content + ranking-aid columns from returned
    metadata (flow_collect.rs:260-278)."""
    drop = [c for c in RANKING_AID_KEYS if c in df.columns]
    if keep_content and "content" in drop:
        drop.remove("content")
    return df.drop(*drop)
