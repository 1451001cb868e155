"""URL canonicalization — the key a crawl dedups and groups on.

Frozen normalization chain (order matters, each step RE2-safe — no
lookaround/backrefs in PATTERNS; replacements use group refs, rendered
per dialect: Spark `$1`, DuckDB `\\1`):

  1. drop the fragment (`#...`);
  2. lowercase scheme://host;
  3. drop a default :80 (http) / :443 (https) port;
  4. strip tracking params (utm_*, fbclid, gclid, mc_eid) wherever they
     sit in the query string, then tidy the separators they leave behind
     (`?&` → `?`, dangling `?`/`&`);
  5. drop a single trailing slash — including the root-path slash: the
     bare authority (`https://h.io`) is the canonical form.

Same chain, three executions: Spark SQL (codegen regexp_replace), DuckDB
(the oracle), Python `re` (the test reference) — the scrub.py discipline
applied to URLs. Reference analog: none (the reference is tabular-only);
this is part of the LLM-training-data operator set.
"""

from __future__ import annotations

import re

# (pattern, replacement-with-\1-style-groups) applied in order AFTER the
# host-lowering step. Patterns are shared verbatim across engines.
_TRACKING = r"(utm_[A-Za-z0-9_]*|fbclid|gclid|mc_eid)"
_STEPS: list[tuple[str, str]] = [
    (r"#.*", ""),                                   # 1. fragment
    (r"^(http://[^/?#]*):80([/?]|$)", r"\1\2"),     # 3. default ports
    (r"^(https://[^/?#]*):443([/?]|$)", r"\1\2"),
    (rf"([?&]){_TRACKING}=[^&#]*", r"\1"),          # 4a. tracking params
    # 4b. separators they left: collapse WHOLE runs in one pass — a plain
    # "&&" rewrite is single-pass ("&&&" -> "&&" residue), so 3+ adjacent
    # stripped params broke idempotence (round-2 ADVICE #1)
    (r"&{2,}", "&"),
    (r"\?&", "?"),
    (r"[?&]$", ""),                                 # 4c. dangling ? or &
    (r"([^/:])/$", r"\1"),                          # 5. trailing slash
]


def _lower_scheme_host_sql(d_spark: bool, expr: str) -> str:
    host = "'^[A-Za-z]+://[^/?#]*'"
    if d_spark:
        ex = f"regexp_extract({expr}, {host}, 0)"
        rest = f"regexp_replace({expr}, {host}, '')"
    else:
        ex = f"regexp_extract({expr}, {host})"
        rest = f"regexp_replace({expr}, {host}, '')"
    return f"concat(lower({ex}), {rest})"


def canonical_url_sql(d_spark: bool, expr: str) -> str:
    """Render the chain for Spark SQL (True) or DuckDB (False)."""
    out = _lower_scheme_host_sql(d_spark, expr)
    for pat, rep in _STEPS:
        lit = pat.replace("\\", "\\\\").replace("'", "\\'") if d_spark \
            else pat.replace("'", "''")
        if d_spark:
            r = rep.replace("\\1", "$1").replace("\\2", "$2")
            out = f"regexp_replace({out}, '{lit}', '{r}')"
        else:
            r = rep.replace("'", "''")
            out = f"regexp_replace({out}, '{lit}', '{r}', 'g')"
    return out


def canonical_url(url: str) -> str:
    """Python reference implementation (test golden)."""
    m = re.match(r"^[A-Za-z]+://[^/?#]*", url)
    out = (m.group(0).lower() + url[m.end():]) if m else url
    for pat, rep in _STEPS:
        out = re.sub(pat, rep, out)
    return out
