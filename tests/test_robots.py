"""RFC 9309 robots.txt: grammar/group-selection/precedence unit tests
against the driver-side twin, plus the broadcast-filter operator seam
(whose plan decision must match the twin row-for-row)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from ohsome_planet_spark.functions.robots import (
    is_allowed,
    parse_robots_txt,
    pattern_to_regex,
)

BODY = """\
# global rules
User-agent: *
Disallow: /private/
Allow: /private/ok/
Crawl-delay: 7

User-agent: GoodBot
User-agent: OtherBot
Disallow: /good/
Allow:

User-agent: CaseBot
Disallow:
"""


def test_group_selection_exact_beats_star():
    p = parse_robots_txt(BODY, "goodbot")
    assert p["matched_group"] == "goodbot"
    assert p["rules"] == [(False, "/good/")]
    # the Allow line with an empty value is a no-op, not an allow-all rule
    assert is_allowed(p["rules"], "/private/x") == (True, None)


def test_multiple_ua_lines_share_one_group():
    p = parse_robots_txt(BODY, "OTHERBOT")
    assert p["rules"] == [(False, "/good/")]


def test_star_group_and_crawl_delay():
    p = parse_robots_txt(BODY, "strangerbot")
    assert p["matched_group"] == "*"
    assert p["crawl_delay"] == 7.0
    assert is_allowed(p["rules"], "/private/ok/deep") == (True, "/private/ok/")
    assert is_allowed(p["rules"], "/private/no") == (False, "/private/")


def test_empty_disallow_group_allows_everything():
    p = parse_robots_txt(BODY, "casebot")
    assert p["matched_group"] == "casebot" and p["rules"] == []
    assert is_allowed(p["rules"], "/anything") == (True, None)


def test_no_robots_means_allowed():
    p = parse_robots_txt("", "anybot")
    assert p["matched_group"] is None and p["rules"] == []


def test_wildcard_and_anchor_translation():
    assert pattern_to_regex("/a/*.bak$") == r"^/a/.*\.bak$"
    assert pattern_to_regex("/plain") == "^/plain"
    rules = [(False, "/*.php$"), (True, "/cgi/*.php$")]
    assert is_allowed(rules, "/x/y.php") == (False, "/*.php$")
    assert is_allowed(rules, "/cgi/y.php") == (True, "/cgi/*.php$")
    assert is_allowed(rules, "/x/y.php3")[0] is True  # $ anchors


def test_allow_wins_length_ties():
    rules = [(False, "/dir/a"), (True, "/dir/b")]
    # same length, different paths — sanity
    assert is_allowed(rules, "/dir/a1") == (False, "/dir/a")
    # true tie: identical pattern length matching the same path
    tie = [(False, "/p/x*"), (True, "/p/*x")]
    assert is_allowed(tie, "/p/xx") == (True, "/p/*x")


def test_comments_and_malformed_lines_ignored():
    body = "User-agent: *\nDisallow: /a/ # trailing comment\nnonsense line\nDisallow /b/\n"
    p = parse_robots_txt(body, "bot")
    assert p["rules"] == [(False, "/a/")]


def test_group_header_reset_after_body():
    # a new User-agent line after rules starts a NEW group header
    body = (
        "User-agent: a\nDisallow: /a/\n"
        "User-agent: b\nDisallow: /b/\n"
    )
    assert parse_robots_txt(body, "a")["rules"] == [(False, "/a/")]
    assert parse_robots_txt(body, "b")["rules"] == [(False, "/b/")]


def test_operator_matches_driver_twin(spark):
    """Randomized property: the Spark broadcast-filter decision equals
    the driver-side reference procedure for every (host, path)."""
    from ohsome_planet_spark.operators.web import robots_filter, robots_rules

    rng = random.Random(5)
    hosts = {}
    for h in range(8):
        lines = ["User-agent: *"]
        for _ in range(rng.randrange(1, 5)):
            kind = rng.choice(["Allow", "Disallow"])
            seg = rng.choice(["/a/", "/a/b/", "/c*", "/d/*.x$", "/e"])
            lines.append(f"{kind}: {seg}")
        hosts[f"h{h}"] = "\n".join(lines)
    paths = ["/a/", "/a/b/c", "/cxx", "/d/q.x", "/d/q.xy", "/e", "/zz"]
    urls = [
        (i, f"h{i % 8}", paths[i % len(paths)])
        for i in range(56)
    ]
    expected = {}
    for i, h, path in urls:
        rules = parse_robots_txt(hosts[h], "bot")["rules"]
        expected[i] = is_allowed(rules, path)

    bodies = spark.createDataFrame(
        list(hosts.items()), "host string, robots string"
    )
    rules_df = robots_rules(bodies, "robots", agent="bot")
    urls_df = spark.createDataFrame(urls, "doc_id long, host string, path string")
    got = {
        r["doc_id"]: (r["allowed"], r["matched_pattern"])
        for r in robots_filter(urls_df, rules_df).collect()
    }
    assert got == expected
    # the rule dim must actually broadcast
    plan = robots_filter(urls_df, rules_df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
