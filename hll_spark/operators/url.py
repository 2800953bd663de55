"""URL normalization/parsing for Common-Crawl-style web tables.

Distinct-url sketches (the north-star metric) are only meaningful after
canonicalization: the same page is crawled as ``HTTP://Example.com:80/a``
and ``http://example.com/a#frag``. These operators are pure JVM regexp/
string expressions (whole-stage codegen, RE2-compatible patterns so a
DuckDB oracle can mirror them verbatim):

``normalize_url`` applies the standard safe canonicalizations:

1. strip the fragment (``#...`` — never sent to the server);
2. lowercase the scheme and host (RFC 3986 §6.2.2.1);
3. drop the default port (``:80`` for http, ``:443`` for https);
4. empty path becomes ``/`` (RFC 3986 §6.2.3).

Inputs without a ``scheme://`` prefix pass through with only the
fragment stripped. Userinfo (``user@host``) is not split out — the
whole authority is lowercased; crawl URL canonicalizers treat such
URLs as junk anyway. Query strings are preserved byte-for-byte
(parameter reordering changes semantics for some sites, so it is NOT a
safe canonicalization and is deliberately not done).

The reference repo has no URL layer (its input is pre-hashed values);
this exists because the north-star pipeline keys its flagship sketch on
urls (BASELINE.json input_hint).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from .extract import _as_col

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_AFTER_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"


def strip_fragment(url: str | Column) -> Column:
    """Remove ``#fragment`` ((?s): a stray newline stays in the
    fragment, matching RE2/DuckDB semantics exactly)."""
    return F.regexp_replace(_as_col(url), r"(?s)#.*", "")


def url_host(url: str | Column) -> Column:
    """Lowercased host (authority minus any ``:port``); '' when the
    input has no ``scheme://``."""
    auth = F.regexp_extract(_as_col(url), _AUTH_RE, 1)
    return F.lower(F.regexp_replace(auth, r":[0-9]+$", ""))


def normalize_url(url: str | Column) -> Column:
    """Canonicalize a URL column (see module docstring for the rules)."""
    s = strip_fragment(url)
    scheme = F.regexp_extract(s, _SCHEME_RE, 1)
    auth = F.regexp_extract(s, _AUTH_RE, 1)
    rest = F.regexp_replace(s, _AFTER_AUTH_RE, "")
    host = F.regexp_replace(auth, r":[0-9]+$", "")
    port = F.regexp_extract(auth, r":([0-9]+)$", 1)
    lscheme = F.lower(scheme)
    default_port = ((lscheme == "http") & (port == F.lit("80"))) | (
        (lscheme == "https") & (port == F.lit("443"))
    )
    port_part = F.when(
        (port == F.lit("")) | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    path_part = F.when(rest == F.lit(""), F.lit("/")).otherwise(rest)
    rebuilt = F.concat(
        lscheme, F.lit("://"), F.lower(host), port_part, path_part
    )
    return F.when(scheme == F.lit(""), s).otherwise(rebuilt)


# The DuckDB mirror of normalize_url, over a column expression {col} —
# kept next to the implementation so driver oracles and tests stay in
# lockstep with the rules above. Identical RE2 patterns, identical
# branch structure.
DUCKDB_NORMALIZE_SQL = """
    CASE WHEN regexp_extract(__S__, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1) = ''
         THEN __S__
         ELSE lower(regexp_extract(__S__, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
              || '://'
              || lower(regexp_replace(
                     regexp_extract(__S__, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
                     ':[0-9]+$', ''))
              || CASE
                   WHEN regexp_extract(
                            regexp_extract(__S__, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
                            ':([0-9]+)$', 1) = '' THEN ''
                   WHEN lower(regexp_extract(__S__, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) = 'http'
                        AND regexp_extract(
                                regexp_extract(__S__, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
                                ':([0-9]+)$', 1) = '80' THEN ''
                   WHEN lower(regexp_extract(__S__, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) = 'https'
                        AND regexp_extract(
                                regexp_extract(__S__, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
                                ':([0-9]+)$', 1) = '443' THEN ''
                   ELSE ':' || regexp_extract(
                            regexp_extract(__S__, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
                            ':([0-9]+)$', 1)
                 END
              || CASE WHEN regexp_replace(__S__, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '') = ''
                      THEN '/'
                      ELSE regexp_replace(__S__, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '') END
    END
""".strip()


def duckdb_normalize_expr(col_sql: str) -> str:
    """The oracle SQL expression for ``normalize_url`` applied to the
    (already fragment-stripped) DuckDB expression ``col_sql``."""
    return DUCKDB_NORMALIZE_SQL.replace("__S__", f"({col_sql})")
