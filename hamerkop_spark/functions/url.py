"""URL parsing, canonicalization, and registrable-domain extraction as
native Catalyst column expressions (zero UDFs).

Why this exists: the engine's input table is keyed by ``url``
(BASELINE.json input_hint: Common-Crawl-style pages ``(url, warc_ts,
html, text, lang)``), and the single highest-leverage dedup move on a
web crawl is collapsing re-crawls / tracking-link variants of the SAME
page BEFORE any content fingerprinting runs — at 10^12 documents the
canonical-URL groupBy removes a large fraction of exact re-fetches for
the cost of one string expression + one shuffle, whereas MinHash et al.
pay a full text pass. The reference has no URL tooling (it consumes
pre-extracted CoNLL text, hamerkop/io.py); this is new capability for
the web-scale tier.

Semantics (documented subset of RFC 3986 §6 normalization + the
industry-standard tracking-parameter strip; every rule is a pure
string/array expression so Spark and DuckDB agree by construction):

1. scheme and host lowercase (§6.2.2.1 case normalization);
2. fragment removed (§3.5 — fragments are client-side);
3. default port dropped (``http:80``, ``https:443`` — §6.2.3);
4. empty path -> ``/`` (§6.2.3 scheme-based normalization);
5. query parameters: known tracking params removed (``utm_*``,
   ``gclid``, ``fbclid``, ``msclkid``, ``igshid``, ``mc_cid``,
   ``mc_eid``, ``ref``), the rest sorted bytewise as whole ``k=v``
   atoms (duplicates kept), empty query -> no ``?``;
6. userinfo and non-default ports are PRESERVED (they change the
   resource); percent-encoding is left byte-exact (re-coding requires
   charset guesses — wrong on real crawls more often than right).

Non-URLs (no ``scheme://`` match) canonicalize to NULL so a downstream
groupBy never merges garbage rows into one mega-group.

``registrable_domain`` uses an embedded list of the common multi-part
public suffixes (co.uk, com.au, ...). The full Public Suffix List is
external data and drifts; the embedded subset is the stable core and
the function takes an override list for deployments that ship the PSL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# RFC 3986 appendix-B shaped matcher, restricted to absolute URLs with
# an authority (the only form a crawl frontier stores). Group 1 scheme,
# 2 authority, 3 path, 4 query (no '?'), 5 fragment (no '#'). Both
# Java regex (Spark) and RE2 (DuckDB) return '' for a non-participating
# group and for a non-match, and a matched scheme is never empty — so
# scheme=='' doubles as the validity flag on both engines.
URL_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#(.*))?$"

# Tracking params stripped by canonicalization: the query-string noise
# dominating crawl-duplicate URLs (Google/Facebook/Microsoft click ids,
# Mailchimp ids, bare referrer tags). Matched as whole-key prefixes
# (`k` or `k=...`), never as substrings of other keys.
TRACKING_PARAM_RE = (
    r"^(?:utm_[^=&]*|gclid|fbclid|msclkid|igshid|mc_cid|mc_eid|ref)(?:=|$)"
)

# Common multi-part public suffixes (embedded stable core; pass the PSL
# via `multi_suffixes` to widen). Lowercase.
MULTI_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "sch.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "net.nz", "org.nz",
    "com.br", "net.br", "org.br",
    "com.cn", "net.cn", "org.cn", "edu.cn", "gov.cn",
    "com.mx", "com.ar", "com.tr", "com.sg", "com.hk", "com.tw",
    "com.my", "com.vn", "com.ph", "com.pk", "com.eg", "com.sa",
    "co.in", "net.in", "org.in", "co.za", "co.kr", "co.id", "co.th",
]


def url_parts(url: Column | str) -> Column:
    """Parse into a struct ``(scheme, userinfo, host, port, path,
    query, fragment)`` — all strings, '' when absent, and every field
    NULL when the value does not look like an absolute URL (no
    ``scheme://``). Pure regexp/array expressions; the struct is
    flattened by Catalyst so selecting one field costs one regex.

    Multiple '@' in the authority (invalid per RFC 3986) follow the
    browser convention: everything up to the LAST '@' is userinfo.
    """
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.regexp_extract(u, URL_RE, 1)
    auth = F.regexp_extract(u, URL_RE, 2)
    # host[:port] = after the last '@' (element_at -1 on the '@' split)
    hostport = F.element_at(F.split(auth, "@"), -1)
    userinfo = F.when(
        auth.contains("@"), F.regexp_replace(auth, r"@[^@]*$", "")
    ).otherwise(F.lit(""))
    port = F.regexp_extract(hostport, r":([0-9]*)$", 1)
    host = F.regexp_replace(hostport, r":[0-9]*$", "")
    valid = scheme != ""
    fields = {
        "scheme": scheme,
        "userinfo": userinfo,
        "host": host,
        "port": port,
        "path": F.regexp_extract(u, URL_RE, 3),
        "query": F.regexp_extract(u, URL_RE, 4),
        "fragment": F.regexp_extract(u, URL_RE, 5),
    }
    return F.struct(
        *[
            F.when(valid, c).otherwise(F.lit(None).cast("string")).alias(n)
            for n, c in fields.items()
        ]
    )


def clean_query(query: Column, tracking_re: str = TRACKING_PARAM_RE) -> Column:
    """Tracking params dropped, survivors sorted bytewise as whole
    ``k=v`` atoms, re-joined with '&'. '' stays ''."""
    params = F.filter(
        F.split(query, "&"),
        lambda x: (x != "") & ~x.rlike(tracking_re),
    )
    return F.array_join(F.array_sort(params), "&")


def url_canonicalize(
    url: Column | str, tracking_re: str = TRACKING_PARAM_RE
) -> Column:
    """Canonical form per the module-doc rules; NULL for non-URLs."""
    p = url_parts(url)
    scheme = F.lower(p["scheme"])
    host = F.lower(p["host"])
    default_port = (
        (p["port"] == "")
        | ((scheme == "http") & (p["port"] == "80"))
        | ((scheme == "https") & (p["port"] == "443"))
    )
    port_part = F.when(default_port, F.lit("")).otherwise(
        F.concat(F.lit(":"), p["port"])
    )
    user_part = F.when(p["userinfo"] == "", F.lit("")).otherwise(
        F.concat(p["userinfo"], F.lit("@"))
    )
    path = F.when(p["path"] == "", F.lit("/")).otherwise(p["path"])
    q = clean_query(p["query"], tracking_re)
    q_part = F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q))
    return F.when(
        p["scheme"].isNotNull(),
        F.concat(scheme, F.lit("://"), user_part, host, port_part, path,
                 q_part),
    )


def registrable_domain(
    host: Column | str, multi_suffixes: list[str] | None = None
) -> Column:
    """eTLD+1 under the embedded multi-part-suffix core: the last two
    labels, or the last three when the last two form a known multi-part
    public suffix. Single-label hosts (``localhost``) and IPv4
    literals pass through whole. Case-insensitive (result lowercase).
    """
    h = F.lower(F.col(host) if isinstance(host, str) else host)
    suffixes = [s.lower() for s in (multi_suffixes or MULTI_SUFFIXES)]
    labels = F.split(h, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    is_ip = h.rlike(r"^[0-9]+(\.[0-9]+){3}$")
    return (
        F.when(h.isNull(), F.lit(None).cast("string"))
        .when(is_ip | (n <= 1), h)
        .when((n >= 3) & last2.isin(suffixes), last3)
        .otherwise(last2)
    )
