"""robots.txt parsing (RFC 9309, the Robots Exclusion Protocol):
crawl-politeness filtering is a load-bearing stage of every web-corpus
pipeline (C4/CCNet drop robots-disallowed URLs before any text work).

What is REAL here: the line grammar (case-insensitive directives,
``#`` comments, blank-line-tolerant groups, multiple user-agent lines
heading one group), group selection (exact product-token match beats
the ``*`` group; no group → allow all), rule semantics (empty
Disallow is a no-op per §2.2.2, ``*`` wildcard and ``$`` end anchor
per §2.2.3), and the longest-match decision rule: the rule with the
most matched-pattern octets wins; on a tie the Allow rule wins
(§2.2.2 "most specific match"). Sitemap and Crawl-delay lines are
surfaced as metadata.

Patterns are compiled once to anchored regexes so the Spark operator
can evaluate them JVM-side (``regexp_like``) after a broadcast join —
robots tables are tiny dims; URL bytes never shuffle.
"""

from __future__ import annotations

import re

__all__ = ["parse_robots_txt", "pattern_to_regex"]


def pattern_to_regex(pattern: str) -> str:
    """RFC 9309 §2.2.3 path pattern → anchored regex: ``*`` matches any
    octet run, a FINAL ``$`` anchors at end-of-path, every other byte
    is literal."""
    anchored_end = pattern.endswith("$")
    body = pattern[:-1] if anchored_end else pattern
    out = []
    for ch in body:
        if ch == "*":
            out.append(".*")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + ("$" if anchored_end else "")


def parse_robots_txt(text: str, agent: str) -> dict:
    """Parse a robots.txt body for ``agent`` (product token, matched
    case-insensitively). Returns ``{"rules": [(allow, pattern)],
    "matched_group": "agent"|"*"|None, "sitemaps": [...],
    "crawl_delay": float|None}`` with rules from the most specific
    matching group only (RFC 9309 §2.2.1: merge all groups with the
    same matched token)."""
    agent_lc = agent.lower()
    exact_rules: list[tuple[bool, str]] = []
    star_rules: list[tuple[bool, str]] = []
    exact_delay = star_delay = None
    exact_seen = star_seen = False
    sitemaps: list[str] = []

    cur_agents: list[str] = []
    in_group_body = False  # a non-UA line after UA lines closes the header

    def _targets() -> tuple[bool, bool]:
        exact = any(a == agent_lc for a in cur_agents)
        star = "*" in cur_agents
        return exact, star

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        if ":" not in line:
            continue  # malformed line: ignored, group state unchanged
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "sitemap":
            # non-group directive: does not open/close groups (§2.2.4)
            if value:
                sitemaps.append(value)
            continue
        if key == "user-agent":
            if in_group_body:
                cur_agents = []
                in_group_body = False
            if value:
                cur_agents.append(value.lower())
            continue
        if key in ("allow", "disallow"):
            in_group_body = True
            exact, star = _targets()
            if exact:
                exact_seen = True
            if star:
                star_seen = True
            if not value and key == "disallow":
                continue  # empty Disallow allows everything: no rule
            if not value:
                continue
            rule = (key == "allow", value)
            if exact:
                exact_rules.append(rule)
            if star:
                star_rules.append(rule)
            continue
        if key == "crawl-delay":
            in_group_body = True
            exact, star = _targets()
            try:
                delay = float(value)
            except ValueError:
                continue
            if exact:
                exact_seen = True
                exact_delay = delay
            if star:
                star_seen = True
                star_delay = delay
            continue
        # unknown directive inside a group body: tolerated (§2.2.4)
        in_group_body = True

    if exact_seen:
        group, rules, delay = agent_lc, exact_rules, exact_delay
    elif star_seen:
        group, rules, delay = "*", star_rules, star_delay
    else:
        group, rules, delay = None, [], None
    return {
        "rules": rules,
        "matched_group": group,
        "sitemaps": sitemaps,
        "crawl_delay": delay,
    }


def is_allowed(rules: list[tuple[bool, str]], path: str) -> tuple[bool, str | None]:
    """Reference decision procedure (driver-side twin of the Spark
    plan, used by tests): longest matched pattern wins, Allow wins
    ties, no match → allowed."""
    best: tuple[int, int, str] | None = None  # (len, allow, pattern)
    for allow, pattern in rules:
        if re.match(pattern_to_regex(pattern), path):
            cand = (len(pattern), int(allow), pattern)
            if best is None or cand > best:
                best = cand
    if best is None:
        return True, None
    return bool(best[1]), best[2]
