"""robots.txt (RFC 9309) parsing and URL gating — the crawl-side
counterpart of the WARC/HTTP ingestion layer: CommonCrawl honors
robots rules at fetch time, and corpus builders re-apply them when a
site's policy changes between dump and training run.

Matching model: the combined rules of every matching user-agent
group (RFC 9309 §2.2.1 exact-token match + merge) are compiled
ONCE (driver-side, a robots.txt is a per-host control file of at most
a few hundred lines) into a precedence-ordered regex chain — longest
rule wins, allow wins ties (RFC 9309 §2.2.2) — and evaluated as a
single JVM ``CASE WHEN path RLIKE ...`` projection: zero joins, zero
Python in the per-URL hot path, whole-stage codegen fuses it into the
scan. ``*`` and ``$`` wildcards are translated to regex with every
other byte escaped; the generated patterns live in the Java∩RE2
common subset, and :func:`robots_allowed_sql` emits the IDENTICAL
chain for DuckDB oracles.

Reference has no web story; this extends the r8 HTTP/HTML/URL layer.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "crawl_schedule",
    "parse_robots",
    "robots_crawl_delay",
    "robots_allowed",
    "robots_allowed_py",
    "robots_allowed_sql",
    "sitemap_locs",
    "sitemap_locs_sql",
]


def parse_robots(
    text: str, user_agent: str = "*"
) -> list[tuple[str, bool]]:
    """Parse a robots.txt body and return the rule list
    ``[(path_pattern, is_allow), ...]`` that governs ``user_agent``
    per RFC 9309 §2.2.1: the rules of ALL groups whose ``User-agent``
    token matches the product token EXACTLY (case-insensitive) are
    COMBINED into one group ("If more than one group matches the
    user-agent, the matching groups' rules MUST be combined"); when no
    group matches exactly, all ``*`` groups are combined; else no
    rules. Real robots.txt files commonly repeat ``User-agent: *``
    blocks — every block's rules count (r9 fix: the r8 parser kept
    only the first ``*`` group and matched tokens as substrings, so a
    ``bot`` group could capture ``trainbot`` and later ``*`` blocks
    were silently dropped — a compliance false-allow). Comments
    (#...), blank lines, and non-rule directives (Crawl-delay,
    Sitemap) are ignored; empty ``Disallow:`` (allow-all) contributes
    no rule."""
    matched, hit = _matched_groups(text, user_agent)
    return [r for g in matched for r in g["rules"]] if hit else []


def robots_crawl_delay(text: str, user_agent: str = "*") -> float | None:
    """``Crawl-delay`` seconds governing ``user_agent``, or None when
    no matching group declares one (or the value doesn't parse). The
    directive is non-standard (RFC 9309 ignores it; Bing/Yandex honor
    it per group), so group selection follows the same §2.2.1
    precedence as :func:`parse_robots` (exact groups beat ``*``,
    matching groups combine) and multiple declarations combine
    CONSERVATIVELY — the maximum delay wins, the polite reading for a
    crawl scheduler's per-host budget."""
    matched, hit = _matched_groups(text, user_agent)
    if not hit:
        return None
    best: float | None = None
    for g in matched:
        for v in g["delays"]:
            try:
                d = float(v)
            except ValueError:
                continue
            if d >= 0 and (best is None or d > best):
                best = d
    return best


def _matched_groups(text: str, user_agent: str):
    """(groups governing user_agent, matched?) with §2.2.1 precedence:
    all exact-token groups when any exists, else all ``*`` groups."""
    groups: list[dict] = []
    cur = {"agents": [], "rules": [], "delays": []}
    in_group_body = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, colon, val = line.partition(":")
        if not colon:
            continue
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_group_body:
                # a User-agent after group-body directives starts a
                # NEW group
                groups.append(cur)
                cur = {"agents": [], "rules": [], "delays": []}
                in_group_body = False
            cur["agents"].append(val.lower())
        elif key in ("allow", "disallow"):
            in_group_body = True
            if val:
                cur["rules"].append((val, key == "allow"))
            # empty Disallow: = allow everything -> no rule at all;
            # empty Allow: equally vacuous
        elif key == "crawl-delay":
            # group-body directive (r9, matching Google's parser):
            # "UA: a / Crawl-delay / UA: b / Disallow" gives b its OWN
            # group rather than folding a and b together
            in_group_body = True
            cur["delays"].append(val)
        # other directives (sitemap, host) are ignored
    if cur["agents"] or cur["rules"] or cur["delays"]:
        groups.append(cur)
    ua = user_agent.lower()
    # a group is taken at most once even if several of its UA lines
    # match (exact beats *, and duplicates don't double)
    exact = [g for g in groups if any(a == ua for a in g["agents"])]
    if exact:
        return exact, True
    # reached only when NO group names ua, so a plain * filter suffices
    star = [g for g in groups if any(a == "*" for a in g["agents"])]
    return star, bool(star)


def _rule_regex(rule: str) -> str:
    """RFC 9309 pattern -> anchored regex in the Java∩RE2 subset:
    ``*`` matches any run, a FINAL ``$`` anchors the end, every other
    byte is matched literally (escaped with a backslash — Java and
    RE2 agree on identity escapes for ASCII punctuation)."""
    anchored_end = rule.endswith("$")
    body = rule[:-1] if anchored_end else rule
    out = ["^"]
    for ch in body:
        if ch == "*":
            out.append(".*")
        elif ch.isalnum() or ch in "/_-":
            out.append(ch)
        else:
            out.append("\\" + ch)
    if anchored_end:
        out.append("$")
    return "".join(out)


def _ordered(rules: list[tuple[str, bool]]) -> list[tuple[str, bool]]:
    """Precedence order: longest rule first (most specific wins),
    allow before disallow at equal length (RFC 9309 §2.2.2 tie rule).
    Evaluating the chain first-match-wins under this order implements
    the spec exactly."""
    return sorted(rules, key=lambda r: (-len(r[0]), not r[1]))


def robots_allowed(
    col: Column | str, rules: list[tuple[str, bool]]
) -> Column:
    """Boolean Column: is the URL path allowed under ``rules`` (from
    :func:`parse_robots`)? One codegen-fused CASE chain over anchored
    RLIKEs; no rule matching -> allowed (RFC 9309 §2.2.2)."""
    c = F.col(col) if isinstance(col, str) else col
    chain: Column | None = None
    for rule, is_allow in _ordered(rules):
        cond = c.rlike(_rule_regex(rule))
        chain = (
            F.when(cond, F.lit(bool(is_allow)))
            if chain is None
            else chain.when(cond, F.lit(bool(is_allow)))
        )
    if chain is None:
        return F.lit(True)
    return F.coalesce(chain, F.lit(True))


def robots_allowed_py(path: str, rules: list[tuple[str, bool]]) -> bool:
    """Pure-Python mirror of :func:`robots_allowed` (same order, same
    regexes) for tests and driver-side use."""
    import re

    for rule, is_allow in _ordered(rules):
        if re.search(_rule_regex(rule), path):
            return bool(is_allow)
    return True


def robots_allowed_sql(expr: str, rules: list[tuple[str, bool]]) -> str:
    """The DuckDB mirror: the identical precedence chain as a CASE
    over regexp_matches."""
    ordered = _ordered(rules)
    if not ordered:
        return "TRUE"
    parts = ["CASE"]
    for rule, is_allow in ordered:
        pat = _rule_regex(rule).replace("'", "''")
        parts.append(
            f"WHEN regexp_matches({expr}, '{pat}') "
            f"THEN {'TRUE' if is_allow else 'FALSE'}"
        )
    parts.append("ELSE TRUE END")
    return " ".join(parts)


# --- sitemaps ---------------------------------------------------------
#
# The discovery side of the crawl trio (robots points at sitemaps,
# sitemaps enumerate URLs, WARC holds the fetches). <loc> extraction
# is one regexp_extract_all — present and list-semantics-identical in
# Spark and DuckDB — so frontier building stays a JVM projection.
_SITEMAP_LOC = r"(?is)<loc>[ \t\r\n]*(.*?)[ \t\r\n]*</loc>"


def sitemap_locs(col: Column | str) -> Column:
    """Array of the <loc> URLs of a sitemap / sitemap-index XML body,
    in document order (urlset and sitemapindex both use <loc>). Lazy
    match keeps nested garbage from gluing entries together; leading/
    trailing whitespace inside the tag is stripped (spec allows it)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(_SITEMAP_LOC), F.lit(1))


def sitemap_locs_sql(expr: str) -> str:
    return f"regexp_extract_all({expr}, '{_SITEMAP_LOC}', 1)"


# --- politeness scheduling --------------------------------------------


def crawl_schedule(
    df,
    url_col: str = "url",
    delay_col: str | None = None,
    default_delay: float = 1.0,
):
    """Politeness schedule for a fetch frontier: per-host FIFO slots
    spaced by the host's Crawl-delay — the planning step between
    frontier dedup (``url_normalize`` + distinct) and the fetcher.
    Appends ``host``, ``fetch_slot`` (0-based rank within the host in
    deterministic ``url_col`` order — pass a DEDUPED frontier; ties in
    the url would make ranks nondeterministic), and ``fetch_at_s``
    (= slot × delay, the earliest polite fetch offset in seconds from
    the host's crawl start). ``delay_col`` names a per-row delay
    column (e.g. :func:`robots_crawl_delay` joined per host; NULL
    falls back to ``default_delay``).

    Scale: ONE hash exchange on the host key, then a per-host window —
    politeness itself bounds per-partition work (a host's frontier is
    crawlable only if it is small relative to the corpus); no global
    sort, no driver state. Hot hosts are real but bounded: a window
    over 10^6 rows of one host is still one task of simple ranking.
    """
    from pyspark.sql import Window

    from tafra_spark.sources.http import url_host

    taken = {"host", "fetch_slot", "fetch_at_s"} & set(df.columns)
    if taken:
        # appending must never silently re-key a frontier whose host
        # column (possibly normalized differently) the delays were
        # joined on — refuse instead of overwrite (late-r9 review)
        raise ValueError(
            f"crawl_schedule: input already has {sorted(taken)}; "
            "rename or drop before scheduling"
        )
    delay = (
        F.coalesce(F.col(delay_col), F.lit(float(default_delay)))
        if delay_col
        else F.lit(float(default_delay))
    )
    w = Window.partitionBy("host").orderBy(url_col)
    return (
        df.withColumn("host", url_host(F.col(url_col)))
        .withColumn(
            "fetch_slot", (F.row_number().over(w) - 1).cast("long")
        )
        .withColumn(
            "fetch_at_s",
            (F.col("fetch_slot").cast("double") * delay).cast("double"),
        )
    )
