"""robots.txt ingestion: parse the real file format into the engine's
ROBOTS table (host, disallow_prefixes, crawl_delay).

The reference has no robots support at all (north_rule addition); the
engine consumes a parquet robots table, and this module produces that
table either from raw robots.txt bodies or straight from a pages corpus
containing fetched ``/robots.txt`` urls (a Dataset pipeline -- the shape
a real crawl uses: fetch robots first, build the gate table, then
crawl).

Parsing follows the de-facto standard (RFC 9309 simplified): group
records by User-agent; a group applies if it names ``user_agent``
exactly (case-insensitive) or ``*``; specific-UA groups override the
``*`` group entirely; Disallow values are path prefixes (empty value =
allow all); Crawl-delay is a float of seconds.
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray.data as rd

from pomp_ray import schemas
from pomp_ray.functions.textfns import body_decode, url_host, url_path


def parse_robots_txt(text: str | bytes,
                     user_agent: str = "*") -> dict:
    """robots.txt body -> {"disallow_prefixes": [...],
    "allow_prefixes": [...], "crawl_delay": float}."""
    ua = user_agent.lower()
    groups: dict[str, dict] = {}   # ua -> {"disallow": [...], ...}
    sitemaps: list[str] = []       # group-independent per RFC 9309
    current: list[str] = []
    last_was_ua = False
    for raw in body_decode(text).splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "sitemap":
            if value and value not in sitemaps:
                sitemaps.append(value)
            last_was_ua = False
            continue
        if field == "user-agent":
            name = value.lower()
            if last_was_ua:
                current.append(name)
            else:
                current = [name]
            groups.setdefault(name, {"disallow": [], "allow": [],
                                     "delay": 0.0})
            last_was_ua = True
            continue
        last_was_ua = False
        if not current:
            continue
        for name in current:
            g = groups[name]
            if field == "disallow" and value:
                g["disallow"].append(value)
            elif field == "allow" and value:
                g["allow"].append(value)
            elif field == "crawl-delay":
                try:
                    g["delay"] = float(value)
                except ValueError:
                    pass
    chosen = groups.get(ua) if ua != "*" else None
    if chosen is None:
        chosen = groups.get("*", {"disallow": [], "allow": [],
                                  "delay": 0.0})
    return {"disallow_prefixes": list(chosen["disallow"]),
            "allow_prefixes": list(chosen.get("allow") or []),
            "crawl_delay": float(chosen["delay"]),
            "sitemaps": sitemaps}


def robots_batch(t: pa.Table, user_agent: str = "*") -> pa.Table:
    """Pages-schema batch -> ROBOTS-schema rows for its /robots.txt urls."""
    hosts, dis, allow, delay = [], [], [], []
    for url, html in zip(t["url"].to_pylist(), t["html"].to_pylist()):
        if url_path(url) != "/robots.txt":
            continue
        rules = parse_robots_txt(html or b"", user_agent)
        hosts.append(url_host(url))
        dis.append(rules["disallow_prefixes"])
        allow.append(rules["allow_prefixes"])
        delay.append(rules["crawl_delay"])
    return pa.table({
        "host": pa.array(hosts, pa.string()),
        "disallow_prefixes": pa.array(dis, pa.list_(pa.string())),
        "allow_prefixes": pa.array(allow, pa.list_(pa.string())),
        "crawl_delay": pa.array(delay, pa.float64()),
    }, schema=schemas.ROBOTS)


def robots_table_from_corpus(pages_path: str,
                             user_agent: str = "*") -> pa.Table:
    """Distributed pass over a pages corpus: parse every fetched
    ``/robots.txt`` body into one small ROBOTS table (collected -- one
    row per host, tiny by construction)."""
    ds = rd.read_parquet(pages_path, columns=["url", "html"])
    rows = ds.map_batches(
        lambda t: robots_batch(t, user_agent),
        batch_format="pyarrow").take_all()
    if not rows:
        return schemas.ROBOTS.empty_table()
    return pa.Table.from_pylist(rows, schema=schemas.ROBOTS)


def write_robots_table(pages_path: str, out_path: str,
                       user_agent: str = "*") -> int:
    import pyarrow.parquet as pq
    t = robots_table_from_corpus(pages_path, user_agent)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    pq.write_table(t, out_path)
    return t.num_rows


def rule_regex(rule: str) -> str | None:
    """RFC 9309 wildcard rule -> anchored RE2 pattern, or None when the
    rule is a plain prefix (the vectorized starts_with fast path
    handles those).  ``*`` matches any character sequence; a trailing
    ``$`` anchors the end of the path; both only have meaning when
    present, so the common prefix-only rule never pays regex cost."""
    if "*" not in rule and not rule.endswith("$"):
        return None
    import re as _re

    anchored_end = rule.endswith("$")
    body = rule[:-1] if anchored_end else rule
    pat = "^" + ".*".join(_re.escape(part)
                          for part in body.split("*"))
    return pat + "$" if anchored_end else pat


def path_matches(path: str, rule: str) -> bool:
    """Does a URL path match one disallow rule?  Shared by the serial
    conformance oracle and unit tests; the engine's vectorized gate
    (stages/enqueue.make_robots_flag) implements the identical
    semantics with Arrow kernels."""
    pat = rule_regex(rule)
    if pat is None:
        return path.startswith(rule)
    import re as _re

    return _re.match(pat, path) is not None


def robots_blocked(path: str, disallow_rules, allow_rules=()) -> bool:
    """RFC 9309 rule-group decision: among ALL matching rules (allow
    and disallow), the most specific -- longest raw pattern -- wins;
    an allow/disallow tie at equal length resolves to ALLOW (the least
    restrictive reading, matching Google's reference matcher).  No
    matching rule = allowed.  Shared by the serial driver paths, the
    conformance oracle and tests; the vectorized gate
    (stages/enqueue.make_robots_flag) mirrors it with Arrow kernels."""
    best_dis = -1
    for r in disallow_rules:
        if len(r) > best_dis and path_matches(path, r):
            best_dis = len(r)
    if best_dis < 0:
        return False
    best_allow = -1
    for r in allow_rules or ():
        if len(r) > best_allow and path_matches(path, r):
            best_allow = len(r)
    return best_dis > best_allow
