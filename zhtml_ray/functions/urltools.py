"""URL canonicalization for crawl pipelines (host stats, URL-level dedup).

Crawl-scale corpora key almost everything on the URL: per-host crawl
budgets, URL-level exact dedup before content dedup, and domain-level
quality priors all need ONE canonical form per page. The public recipe
(e.g. CCNet / Common Crawl tooling) is: lowercase scheme+host, strip
default ports, drop the fragment, and strip tracking (``utm_*``)
parameters. This module implements that as pure vectorized RE2 maps —
zero shuffle; downstream per-host aggregates pre-combine per batch.

Single source of truth: ``URL_PARTS_RE`` + ``PATHQUERY_RULES`` drive
both the Arrow kernels (:func:`canonicalize_batch`) and the generated
DuckDB oracle SQL (:func:`sql_canonical_exprs`), so the differential
gate compares two independent RE2 engines on the same rule text.

Semantics notes (kept identical on both sides):

* the parts regex excludes the fragment by construction (``[^#]*``);
* ``utm_*`` stripping is three single-pass global replaces: all
  non-leading utm params, a leading utm param followed by another
  param, a query that is solely one utm param — which together remove
  every utm param in one application;
* an empty path canonicalizes to ``/``;
* rows that don't parse as absolute URLs get null canonical/host in
  Arrow (DuckDB's ``regexp_extract`` returns '' instead of NULL there,
  so the oracle queries only run over well-formed URLs).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# scheme :// authority path+query (fragment excluded by [^#]*)
URL_PARTS_RE = (r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://"
                r"(?P<auth>[^/?#]*)(?P<rest>[^#]*)")

# default-port strip on the authority (http/https family)
AUTH_RULES: tuple[tuple[str, str], ...] = (
    (r":(?:80|443)$", ""),
)

# tracking-param strip + empty-query tidy on path+query, in order
PATHQUERY_RULES: tuple[tuple[str, str], ...] = (
    (r"&utm_[A-Za-z0-9_]*=[^&#]*", ""),        # every non-leading utm
    (r"\?utm_[A-Za-z0-9_]*=[^&#]*&", "?"),     # leading utm, more follow
    (r"\?utm_[A-Za-z0-9_]*=[^&#]*$", ""),      # query was solely utm
    (r"\?$", ""),                              # empty query leftover
)


def canonicalize_batch(batch: pa.Table, url_col: str = "url") -> pa.Table:
    """Append ``host`` (lowercased, default port stripped) and
    ``canonical_url`` columns. Vectorized RE2 end to end."""
    parts = pc.extract_regex(batch[url_col], URL_PARTS_RE)
    scheme = pc.utf8_lower(pc.struct_field(parts, "scheme"))
    auth = pc.struct_field(parts, "auth")
    for pat, repl in AUTH_RULES:
        auth = pc.replace_substring_regex(auth, pat, repl)
    host = pc.utf8_lower(auth)
    rest = pc.struct_field(parts, "rest")
    for pat, repl in PATHQUERY_RULES:
        rest = pc.replace_substring_regex(rest, pat, repl)
    rest = pc.if_else(pc.equal(rest, ""), pa.scalar("/"), rest)
    canonical = pc.binary_join_element_wise(scheme, "://", host, rest, "")
    cols = dict(zip(batch.column_names, batch.columns))
    cols["host"] = host
    cols["canonical_url"] = canonical
    return pa.table(cols)


def sql_canonical_exprs(col: str = "url") -> tuple[str, str]:
    """Generate DuckDB ``(host_expr, canonical_expr)`` from the SAME
    pattern/rule text as :func:`canonicalize_batch` (group indices 1-3
    = scheme, auth, rest)."""
    auth = f"regexp_extract({col}, '{URL_PARTS_RE}', 2)"
    for pat, repl in AUTH_RULES:
        auth = f"regexp_replace({auth}, '{pat}', '{repl}', 'g')"
    host = f"lower({auth})"
    rest = f"regexp_extract({col}, '{URL_PARTS_RE}', 3)"
    for pat, repl in PATHQUERY_RULES:
        rest = f"regexp_replace({rest}, '{pat}', '{repl}', 'g')"
    rest = f"CASE WHEN {rest} = '' THEN '/' ELSE {rest} END"
    scheme = f"lower(regexp_extract({col}, '{URL_PARTS_RE}', 1))"
    canonical = f"{scheme} || '://' || {host} || {rest}"
    return host, canonical
