"""URL canonicalization for crawl pipelines (host stats, URL-level dedup).

Crawl-scale corpora key almost everything on the URL: per-host crawl
budgets, URL-level exact dedup before content dedup, and domain-level
quality priors all need ONE canonical form per page. The public recipe
(e.g. CCNet / Common Crawl tooling) is: lowercase scheme+host, strip
the scheme's default port, drop the fragment, and strip tracking
(``utm_*``) parameters. This module implements that as pure vectorized
RE2 maps — zero shuffle; downstream per-host aggregates pre-combine
per batch.

Single source of truth: ``URL_PARTS_RE`` + ``DEFAULT_PORTS`` +
``QUERY_RULES`` drive both the Arrow kernels
(:func:`canonicalize_batch`) and the generated DuckDB oracle SQL
(:func:`sql_canonical_exprs`), so the differential gate compares two
independent RE2 engines on the same rule text.

Semantics notes (kept identical on both sides; the first two are
review-driven fixes):

* default-port stripping is SCHEME-AWARE — ``:80`` only under http,
  ``:443`` only under https (``http://h:443/`` is a different origin
  than ``http://h/`` and must not merge);
* ``utm_*`` stripping operates on the QUERY component only — a literal
  ``&utm_`` inside the path (legal: unencoded ``&`` may appear in
  paths) is untouched;
* the parts regex excludes the fragment by construction (``[^#]*``);
* utm stripping is three single-pass global replaces over the query:
  all non-leading utm params, a leading utm param followed by another
  param, a query that is solely one utm param — together they remove
  every utm param in one application;
* an empty path canonicalizes to ``/``;
* rows that don't parse as absolute URLs get null canonical/host in
  Arrow (DuckDB's ``regexp_extract`` returns '' instead of NULL there,
  so the oracle queries only run over well-formed URLs).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# scheme :// authority path query? (fragment excluded by [^?#]/[^#])
URL_PARTS_RE = (r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://"
                r"(?P<auth>[^/?#]*)(?P<path>[^?#]*)(?P<query>\?[^#]*)?")

# scheme -> default-port strip on the authority (applied only when the
# lowercased scheme matches)
DEFAULT_PORTS: tuple[tuple[str, str], ...] = (
    ("http", r":80$"),
    ("https", r":443$"),
)

# tracking-param strip + empty-query tidy on the QUERY component only
QUERY_RULES: tuple[tuple[str, str], ...] = (
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
    for sch, pat in DEFAULT_PORTS:
        auth = pc.if_else(pc.equal(scheme, sch),
                          pc.replace_substring_regex(auth, pat, ""), auth)
    host = pc.utf8_lower(auth)
    # an absent optional query group extracts as null in Arrow but ''
    # in DuckDB — normalize to '' before the shared rules
    query = pc.fill_null(pc.struct_field(parts, "query"), "")
    for pat, repl in QUERY_RULES:
        query = pc.replace_substring_regex(query, pat, repl)
    path = pc.struct_field(parts, "path")
    path = pc.if_else(pc.equal(path, ""), pa.scalar("/"), path)
    canonical = pc.binary_join_element_wise(
        scheme, "://", host, path, query, "")
    cols = dict(zip(batch.column_names, batch.columns))
    cols["host"] = host
    cols["canonical_url"] = canonical
    return pa.table(cols)


def sql_canonical_exprs(col: str = "url") -> tuple[str, str]:
    """Generate DuckDB ``(host_expr, canonical_expr)`` from the SAME
    pattern/rule text as :func:`canonicalize_batch` (group indices
    1-4 = scheme, auth, path, query)."""
    scheme = f"lower(regexp_extract({col}, '{URL_PARTS_RE}', 1))"
    auth = f"regexp_extract({col}, '{URL_PARTS_RE}', 2)"
    for sch, pat in DEFAULT_PORTS:
        auth = (f"CASE WHEN {scheme} = '{sch}' "
                f"THEN regexp_replace({auth}, '{pat}', '', 'g') "
                f"ELSE {auth} END")
    host = f"lower({auth})"
    query = f"regexp_extract({col}, '{URL_PARTS_RE}', 4)"
    for pat, repl in QUERY_RULES:
        query = f"regexp_replace({query}, '{pat}', '{repl}', 'g')"
    path = f"regexp_extract({col}, '{URL_PARTS_RE}', 3)"
    path = f"CASE WHEN {path} = '' THEN '/' ELSE {path} END"
    canonical = f"{scheme} || '://' || {host} || {path} || {query}"
    return host, canonical
