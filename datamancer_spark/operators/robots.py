"""robots.txt parsing and URL gating — the crawl front end's FIRST
filter (before the URL quality gate, before any fetch/payload work).

Implements the Robots Exclusion Protocol (RFC 9309) relationally, with
zero Python in the loop:

* **grouping**: consecutive ``User-agent`` lines open a group; the
  group's rules run until the next ``User-agent`` line that follows a
  rule (RFC 9309 §2.2.1). A running sum over a per-host line-order
  window assigns group ids — one window, no iteration.
* **group selection**: a crawler obeys the group matching its product
  token exactly (case-insensitive); only when NO group names it does
  the ``*`` group apply (RFC 9309 §2.2.1 — an existing specific group
  makes the wildcard group invisible, including its Disallows).
* **matching**: rules are path-prefix matches with the two standard
  metacharacters — ``*`` (any span) and a trailing ``$`` (end anchor)
  (RFC 9309 §2.2.3). Patterns compile to regexes CATALYST-side
  (escape, ``*`` → ``.*``, anchor) — string ops only.
* **precedence**: the longest matching pattern wins; on a length tie
  Allow beats Disallow (RFC 9309 §2.2.2). No matching rule = allowed,
  empty-pattern rules are inert, and a host with no robots frame at
  all is allowed (joins are left).

Scale shape: rules frames are tiny (a crawl's robots corpus is ~one
small file per host) — the URL gate is ONE broadcast-able left join on
host plus a per-URL best-rule window over the few matching rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: regex specials that must be escaped in a robots path pattern —
#: every special EXCEPT '*' (wildcard) and a trailing '$' (anchor),
#: which carry REP semantics.
_SPECIALS = r"([.^+?(){}\[\]|\\$])"


def _regex_col(pat: "F.Column") -> "F.Column":
    """Column-level pattern→regex: strip a trailing '$' into an end
    anchor, escape regex specials, '*' → '.*', prefix-anchor."""
    has_anchor = pat.endswith("$")
    body = F.when(
        has_anchor, F.substring(pat, 1, F.length(pat) - 1)
    ).otherwise(pat)
    escaped = F.regexp_replace(body, _SPECIALS, r"\\$1")
    wild = F.regexp_replace(escaped, r"\*", ".*")
    return F.concat(
        F.lit("^"), wild, F.when(has_anchor, F.lit("$")).otherwise(F.lit(""))
    )


def _parse_directives(
    robots: DataFrame,
    text_col: str = "robots_txt",
    host_col: str = "host",
) -> DataFrame:
    """Shared directive parse: per-host line explode → comment strip →
    (key, val) classify → group-id assignment. Keys kept:
    user-agent / allow / disallow / crawl-delay (the last is the de
    facto REP extension; including it in the grouping also makes a UA
    line AFTER a crawl-delay open a fresh group, matching the
    crawlers that treat delay as a rule line). Returns
    ``(host, ln, key, val, group_id)``."""
    # real-world robots.txt regularly leads with a UTF-8 BOM (U+FEFF),
    # which would glue onto the first directive key and silently drop
    # the whole first group; CRLF line ends are handled by the trims
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(
            F.split(
                F.regexp_replace(F.col(text_col), "^\ufeff", ""), "\n"
            )
        ).alias("ln", "raw"),
    )
    cleaned = lines.select(
        "host",
        "ln",
        F.trim(F.regexp_replace("raw", "#.*$", "")).alias("line"),
    ).filter(F.length("line") > 0)
    parsed = cleaned.select(
        "host",
        "ln",
        F.lower(F.trim(F.regexp_extract("line", r"^([^:]+):", 1))).alias(
            "key"
        ),
        F.trim(F.regexp_extract("line", r"^[^:]+:(.*)$", 1)).alias("val"),
    ).filter(
        F.col("key").isin("user-agent", "allow", "disallow", "crawl-delay")
    )
    w = Window.partitionBy("host").orderBy("ln")
    # a user-agent line OPENS a new group iff the previous directive
    # line was not itself a user-agent line (consecutive UA lines
    # share the group)
    return parsed.withColumn(
        "_prev_key", F.lag("key").over(w)
    ).withColumn(
        "_new_group",
        (
            (F.col("key") == "user-agent")
            & (
                F.col("_prev_key").isNull()
                | (F.col("_prev_key") != "user-agent")
            )
        ).cast("int"),
    ).withColumn("group_id", F.sum("_new_group").over(w)).drop(
        "_prev_key", "_new_group"
    )


def _group_agents(grouped: DataFrame) -> DataFrame:
    return grouped.filter(F.col("key") == "user-agent").select(
        "host",
        "group_id",
        F.lower(F.col("val")).alias("agent"),
    )


def parse_robots(
    robots: DataFrame,
    text_col: str = "robots_txt",
    host_col: str = "host",
) -> DataFrame:
    """Parse per-host robots.txt text into a rules frame:
    ``(host, group_id, agent, rule, pattern, pattern_len, regex)`` —
    one row per (agent line × rule line) within a group, so group
    selection is a plain filter/join. Comments (``#…``), blank lines
    and unknown directives drop; directive keys are case-insensitive
    and whitespace-tolerant; agents lower-case (product tokens are
    case-insensitive), patterns keep their case (paths are
    case-sensitive). Empty patterns drop (an empty Disallow is the
    RFC's 'allow everything' no-op)."""
    grouped = _parse_directives(robots, text_col, host_col)
    agents = _group_agents(grouped)
    rules = grouped.filter(
        F.col("key").isin("allow", "disallow") & (F.length("val") > 0)
    ).select(
        "host",
        "group_id",
        F.col("key").alias("rule"),
        F.col("val").alias("pattern"),
    )
    out = (
        agents.join(rules, ["host", "group_id"])
        .withColumn("pattern_len", F.length("pattern"))
        .withColumn("regex", _regex_col(F.col("pattern")))
    )
    return out


def robots_sitemaps(
    robots: DataFrame,
    text_col: str = "robots_txt",
    host_col: str = "host",
) -> DataFrame:
    """Extract ``Sitemap:`` directives (RFC 9309 §2.2.4 / sitemaps.org)
    into a (host, sitemap_url) frame — the crawl-discovery companion to
    the rule parser. Sitemap lines are GROUP-INDEPENDENT per the spec
    (they apply regardless of user-agent), so this is a flat scan: no
    group windows, case-insensitive key, comments stripped, absolute
    URLs kept verbatim (the spec requires absolute URLs; relative
    values are dropped rather than guessed)."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.explode(
            F.split(
                F.regexp_replace(F.col(text_col), "^\\ufeff", ""), "\n"
            )
        ).alias("raw"),
    )
    cleaned = lines.select(
        "host",
        F.trim(F.regexp_replace("raw", "#.*$", "")).alias("line"),
    )
    return (
        cleaned.filter(
            F.lower(F.trim(F.regexp_extract("line", r"^([^:]+):", 1)))
            == "sitemap"
        )
        .select(
            "host",
            F.trim(F.regexp_extract("line", r"^[^:]+:(.*)$", 1)).alias(
                "sitemap_url"
            ),
        )
        .filter(F.col("sitemap_url").rlike(r"^[a-z][a-z0-9+.-]*://"))
        .distinct()
    )


def robots_crawl_delays(
    robots: DataFrame,
    agent: str,
    text_col: str = "robots_txt",
    host_col: str = "host",
) -> DataFrame:
    """Per-host ``Crawl-delay`` for the named agent (r12) —
    ``(host, crawl_delay)`` in seconds, the de facto REP extension
    every politeness scheduler consumes. Group selection is IDENTICAL
    to the rules path (the exact-agent group hides the ``*`` group
    entirely — including its delay: a specific group WITHOUT a delay
    means no delay, not the wildcard's). Multiple delay lines in the
    selected groups keep the MAX (conservative); unparseable values
    drop. Hosts without an applicable delay are absent (the politeness
    join is left)."""
    grouped = _parse_directives(robots, text_col, host_col)
    agents = _group_agents(grouped)
    delays = grouped.filter(
        (F.col("key") == "crawl-delay")
        & F.col("val").rlike(r"^\d+(\.\d+)?$")
    ).select(
        "host", "group_id", F.col("val").cast("double").alias("delay")
    )
    joined = agents.join(delays, ["host", "group_id"])
    agent_lc = agent.lower()
    exact = joined.filter(F.col("agent") == agent_lc)
    # the exact group hides '*' even when the exact group has NO
    # delay: fallback applies only to hosts with no exact-agent GROUP
    hosts_with_exact_group = agents.filter(
        F.col("agent") == agent_lc
    ).select("host").distinct()
    fallback = joined.filter(F.col("agent") == "*").join(
        hosts_with_exact_group, "host", "left_anti"
    )
    return (
        exact.unionByName(fallback)
        .groupBy("host")
        .agg(F.max("delay").alias("crawl_delay"))
    )


def robots_effective_rules(
    rules: DataFrame, agent: str
) -> DataFrame:
    """The rules a crawler named ``agent`` must obey, per host: the
    exact-agent group when any exists for that host, otherwise the
    ``*`` group (RFC 9309 §2.2.1 — a specific group HIDES the wildcard
    group entirely). One anti-join decides the fallback; both sides
    are rule-frame-sized."""
    agent_lc = agent.lower()
    exact = rules.filter(F.col("agent") == agent_lc)
    hosts_with_exact = exact.select("host").distinct()
    fallback = rules.filter(F.col("agent") == "*").join(
        hosts_with_exact, "host", "left_anti"
    )
    return exact.unionByName(fallback)


def robots_url_filter(
    urls: DataFrame,
    rules: DataFrame,
    agent: str,
    url_col: str = "url",
    host_col: str = "host",
    out: str = "robots_allowed",
) -> DataFrame:
    """Gate a URL frame against parsed robots rules for ``agent``:
    adds ``out`` (boolean) and ``matched_pattern`` (the winning rule's
    pattern, NULL when no rule matched). Longest-match precedence,
    Allow wins length ties, and equal-length same-type ties break by
    pattern text so the winner is deterministic (the OUTCOME is already
    identical in that case; determinism is for the differential gate).
    No match / no robots for the host = allowed; a NULL or
    unparseable URL gates as path "/" (host-wide rules still apply —
    robots has no opinion on a missing path, and silently allowing
    would bypass a 'Disallow: /'). Schemes match case-insensitively
    (RFC 3986 §3.1).

    Plan: the gate DECISION depends only on (host, path), so the best
    rule is computed once per DISTINCT (host, path) pair — broadcast
    left join on host, regexp match, one window over the few matching
    rules — and joined back to the URL frame null-safely. Keying the
    window on the pair's DATA VALUES (not ``monotonically_increasing_
    id``, r11 ADVICE) makes the plan deterministic under stage
    recomputation: a nondeterministic row id can be reassigned between
    the join and the window when an executor is lost or AQE re-executes
    a stage, silently mixing rule sets across different URLs. The
    distinct also dedups the rule-match fan-out — real crawls re-see
    the same URL constantly."""
    eff = robots_effective_rules(rules, agent).select(
        F.col("host").alias("_rhost"),
        "rule",
        "pattern",
        "pattern_len",
        "regex",
    )
    path = F.coalesce(
        F.nullif(
            F.regexp_extract(
                F.col(url_col),
                r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]+(/.*)?$",
                1,
            ),
            F.lit(""),
        ),
        F.lit("/"),
    )
    keyed = urls.withColumn("_path", path)
    pairs = keyed.select(
        F.col(host_col).alias("_phost"), "_path"
    ).distinct()
    joined = pairs.join(
        F.broadcast(eff),
        (pairs["_phost"] == F.col("_rhost"))
        & F.expr("_path rlike regex"),
        "left",
    )
    # the distinct's hash partitioning on (_phost, _path) is exactly
    # the window's partition key — no extra exchange for the window
    w = Window.partitionBy("_phost", "_path").orderBy(
        F.col("pattern_len").desc(),
        # allow < disallow lexicographically — ascending puts allow first
        F.col("rule").asc(),
        F.col("pattern").asc(),
    )
    decisions = (
        joined.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(
            "_phost",
            F.col("_path").alias("_dpath"),
            F.when(F.col("rule").isNull(), F.lit(True))
            .otherwise(F.col("rule") == "allow")
            .alias(out),
            F.col("pattern").alias("matched_pattern"),
        )
    )
    gated = keyed.join(
        decisions,
        keyed[host_col].eqNullSafe(decisions["_phost"])
        & (keyed["_path"] == decisions["_dpath"]),
        "left",
    )
    return gated.select(
        *[urls[c] for c in urls.columns],
        # the decisions frame covers every distinct pair, so the
        # coalesce only fires if the join-back misses (it cannot);
        # belt-and-braces for the allowed-by-default contract
        F.coalesce(F.col(out), F.lit(True)).alias(out),
        "matched_pattern",
    )


def politeness_schedule(
    frontier: DataFrame,
    delays: DataFrame,
    default_delay: float = 1.0,
    url_col: str = "url",
    host_col: str = "host",
    seed: int = 0,
) -> DataFrame:
    """Per-host fetch schedule under Crawl-delay budgets (r12) — the
    step that turns a discovered frontier plus ``robots_crawl_delays``
    output into WHEN each URL may be fetched: within a host, URLs rank
    by a deterministic portable-hash shuffle (lexical order would
    hammer one path prefix; RNG order would not survive retries or
    engine swaps) and ``eta_sec`` = (rank − 1) × the host's effective
    delay (``default_delay`` where robots set none). The per-host
    serial ETA is the quantity a scheduler balances shards by — a host
    with 10k pages at Crawl-delay 10 is a 28-hour tail no matter how
    many workers exist.

    Plan: the delays frame is host-cardinality and BROADCASTS onto the
    frontier; ranking is ONE hash-partitioned window per host (no
    global sort; AQE skew-split covers mega-hosts). eta stays exact
    across engines: rank is an integer and delay a small literal-
    derived double, so the product has one IEEE rounding both sides."""
    from .dedup import portable_hash

    okey = portable_hash(F.col(url_col), seed=seed)
    w = Window.partitionBy(host_col).orderBy(okey, F.col(url_col))
    eff = F.coalesce(F.col("crawl_delay"), F.lit(float(default_delay)))
    return (
        frontier.join(F.broadcast(delays), host_col, "left")
        .withColumn("fetch_rank", F.row_number().over(w).cast("long"))
        .select(
            host_col,
            url_col,
            "fetch_rank",
            ((F.col("fetch_rank") - 1) * eff).alias("eta_sec"),
        )
    )
