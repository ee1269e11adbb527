"""Corpus selection filters (F1/F2).

The reference filters its filesystem walk with include/exclude path prefixes
plus a case-insensitive extension blacklist
(``filename_pattern.rs:47-84``; default ext blacklist ``arg_parse.rs:183``)
and builds three derived filters — candidates-excluding-refs,
refs-excluding-candidates, and their union (``app_fns.rs:763-806``).

Here they are Catalyst predicates, so they push down into the table scan
(partition pruning when the table is url-prefix-partitioned).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def url_pattern_filter(
    url: Column,
    include_prefixes: list[str] | None = None,
    exclude_prefixes: list[str] | None = None,
    exclude_exts: list[str] | None = None,
) -> Column:
    """include-prefix AND NOT exclude-prefix AND NOT excluded-extension
    (extension compare is case-insensitive, filename_pattern.rs:59-67)."""
    cond = F.lit(True)
    if include_prefixes:
        inc = F.lit(False)
        for p in include_prefixes:
            inc = inc | url.startswith(p)
        cond = cond & inc
    for p in exclude_prefixes or []:
        cond = cond & ~url.startswith(p)
    for ext in exclude_exts or []:
        cond = cond & ~F.lower(url).endswith(ext.lower())
    return cond


def cands_refs_split(
    docs: DataFrame,
    cand_prefixes: list[str],
    ref_prefixes: list[str],
    url_col: str = "url",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The reference's three filters (app_fns.rs:763-806): candidates
    excluding refs, refs excluding candidates, and the union."""
    url = F.col(url_col)
    is_cand = url_pattern_filter(url, include_prefixes=cand_prefixes)
    is_ref = url_pattern_filter(url, include_prefixes=ref_prefixes)
    cands = docs.where(is_cand & ~is_ref)
    refs = docs.where(is_ref & ~is_cand)
    both = docs.where(is_cand | is_ref)
    return cands, refs, both
