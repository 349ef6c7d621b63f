"""Web-provenance operators: URL canonicalization, host extraction,
resource-identity URL dedup keys, host blocklist filtering and HTML
boilerplate stripping — the CommonCrawl-style pre-text stages of a
web-scale quality-filter pipeline (canonicalize the fetch URL, dedup
refetches of the same resource, drop blocklisted hosts, extract text
from markup BEFORE paying for any downstream text compute).

Everything here is a pure Arrow kernel applied through ``map_batches``
(RE2 regexes shared verbatim with the DuckDB oracle twins — both
engines compile RE2, so the patterns below are written once and pasted
into the SQL). None of these kernels shuffles: at 100 TB the whole
family costs one streaming map pass, and the only exchange any of it
feeds is the 128-bit content-key dedup (`ops/dedup.exact_duplicates`)
applied to the canonical key instead of the raw text.

Domain note: the fragment-strip pattern uses RE2 ``.`` which does not
cross newlines; URLs containing literal newlines (invalid per RFC 3986)
keep anything after the first newline.  Rows that do not match the
``scheme://host`` shape at all pass through unchanged with an empty
host — degrade, not die, matching the module convention.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# One split regex shared with the SQL twins (groups 1/2/3 there).
URL_SPLIT_RE = r"^(?P<scheme>[^:]+)://(?P<host>[^/?#]*)(?P<rest>.*)$"
_URL_SPLIT_SQL = r"^([^:]+)://([^/?#]*)(.*)$"

# Tracking-parameter killer: any utm_* key=value pair plus its joining
# separator; a second pass trims a now-dangling trailing '?' or '&'.
UTM_RE = r"utm_[a-z_]+=[^&]*&?"


def normalize_url_batch(t: pa.Table, url_col: str = "url") -> pa.Table:
    """Append ``url_norm`` and ``host`` columns.

    Canonicalization rules (applied in this exact order on both the
    Arrow and the SQL side):

    1. split into scheme / hostport / rest on ``URL_SPLIT_RE``;
    2. lowercase scheme and hostport; strip a leading ``www.``;
    3. strip the DEFAULT port only (``:80`` for http, ``:443`` for
       https — a non-default port is identity-bearing and kept);
    4. drop the fragment (``#...``), drop every ``utm_*`` tracking
       parameter, trim the dangling ``?``/``&``, strip trailing ``/``;
    5. reassemble; non-matching rows keep the raw value and get an
       empty-string host.

    ``host`` is hostport with any remaining ``:port`` removed.
    """
    u = pc.fill_null(t[url_col], "")
    ex = pc.extract_regex(u, URL_SPLIT_RE)
    ok = pc.is_valid(ex)
    scheme = pc.utf8_lower(
        pc.if_else(ok, pc.struct_field(ex, "scheme"), ""))
    hostport = pc.utf8_lower(
        pc.if_else(ok, pc.struct_field(ex, "host"), ""))
    rest = pc.if_else(ok, pc.struct_field(ex, "rest"), "")

    hostport = pc.replace_substring_regex(hostport, r"^www\.", "")
    hp80 = pc.replace_substring_regex(hostport, r":80$", "")
    hp443 = pc.replace_substring_regex(hostport, r":443$", "")
    hostport = pc.if_else(
        pc.equal(scheme, "http"), hp80,
        pc.if_else(pc.equal(scheme, "https"), hp443, hostport))
    host = pc.replace_substring_regex(hostport, r":[0-9]+$", "")

    rest = pc.replace_substring_regex(rest, r"#.*$", "")
    rest = pc.replace_substring_regex(rest, UTM_RE, "")
    rest = pc.replace_substring_regex(rest, r"[?&]+$", "")
    rest = pc.replace_substring_regex(rest, r"/+$", "")

    url_norm = pc.if_else(
        ok,
        pc.binary_join_element_wise(scheme, "://", hostport, rest, ""),
        u)
    host = pc.if_else(ok, host, "")
    return t.append_column("url_norm", url_norm).append_column("host", host)


def resource_key_batch(t: pa.Table, url_col: str = "url") -> pa.Table:
    """Append a scheme-agnostic ``resource_key`` column: the canonical
    hostport plus the path with query string, fragment and trailing
    slashes removed — "the same resource fetched over http and https
    with different tracking params is ONE resource".  This is the dedup
    key of URL-level web dedup; feed it to ``exact_duplicates`` as the
    text column so only 128-bit content keys enter the exchange."""
    t = normalize_url_batch(t, url_col)
    ex = pc.extract_regex(t["url_norm"], URL_SPLIT_RE)
    ok = pc.is_valid(ex)
    hostport = pc.if_else(ok, pc.struct_field(ex, "host"), "")
    path = pc.if_else(ok, pc.struct_field(ex, "rest"), "")
    path = pc.replace_substring_regex(path, r"[?#].*$", "")
    path = pc.replace_substring_regex(path, r"/+$", "")
    key = pc.binary_join_element_wise(hostport, path, "")
    return t.append_column("resource_key", key)


def filter_hosts_batch(
    t: pa.Table, blocked: frozenset[str] | set[str],
    host_col: str = "host",
) -> pa.Table:
    """Drop rows whose ``host_col`` is in ``blocked`` (a SMALL,
    driver-known blocklist — UT1-style host lists are a few MB; at
    cluster scale ship it once with ``ray.put`` and pass the resolved
    set here from the actor/task, never per batch)."""
    mask = pc.invert(pc.is_in(
        pc.fill_null(t[host_col], ""),
        value_set=pa.array(sorted(blocked), pa.string())))
    return t.filter(mask)


# HTML entity decode pairs, applied in this order on both sides
# (``&amp;`` LAST so freshly-decoded ampersands cannot re-trigger the
# other entity patterns — the conventional single-pass decode order).
HTML_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)

TAG_RE = r"<[^>]*>"


def strip_html_batch(
    t: pa.Table, html_col: str = "html", out_col: str = "text_extracted",
) -> pa.Table:
    """Append ``out_col`` (tag-stripped, entity-decoded, whitespace-
    collapsed text) and ``n_tags`` (count of markup tags removed).

    This is the WET-extraction step reduced to its deterministic core:
    tags are replaced by a single space (so ``a<br>b`` keeps its word
    boundary), the five standard entities decode in the fixed
    ``HTML_ENTITIES`` order, runs of whitespace collapse to one space
    and the result is trimmed.  Script/style CONTENT is not dropped —
    that needs a stateful parser; this kernel is the vectorized
    boilerplate-strip used when markup is shallow (the synthetic
    corpus and most WAT-side metadata strings)."""
    h = pc.fill_null(t[html_col], "")
    n_tags = pc.cast(pc.count_substring_regex(h, TAG_RE), pa.int64())
    s = pc.replace_substring_regex(h, TAG_RE, " ")
    for ent, ch in HTML_ENTITIES:
        s = pc.replace_substring(s, ent, ch)
    s = pc.replace_substring_regex(s, r"[ \t\r\n]+", " ")
    s = pc.utf8_trim(s, " ")
    return t.append_column(out_col, s).append_column("n_tags", n_tags)
