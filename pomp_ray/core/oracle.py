"""Serial reference implementation of the crawl semantics ("the oracle").

This is a <150-LoC re-statement of pomp's engine loop
(``Pomp.pump(crawler)``, pomp/core/engine.py ~L60-160 [estimated]; traced
in SURVEY.md section 3.1) extended with the north_rule additions the
reference lacks (robots gating + per-host crawl-delay budget), expressed
round-synchronously so the distributed engine has an exactly-matching
spec:

* dedup happens at ENQUEUE time against a ``seen`` set of canonical URLs
  (the standard pomp dedup-middleware pattern); every accepted entry gets
  a global monotonically increasing ``seq``;
* BFS = pomp's FIFO queue discipline = select in ``seq`` ascending order
  (priority descending first); DFS = LIFO = ``seq`` descending, width 1;
  BEST = priority-queue discipline (north_rule "priority queue") = the
  ``best_width`` highest-priority entries per round, FIFO within equal
  priority -- i.e. the BFS total order cut at a width;
* link priorities come from ``priority_fn(canon_urls, depths) ->
  ints`` when given (seeds always keep their explicit priority);
* robots disallow is checked at enqueue: blocked URLs are marked seen and
  recorded as errors, never fetched;
* per-host budget: per round at most ``k = max(1, floor(round_budget_s /
  crawl_delay))`` pages from a host with ``crawl_delay > 0``; the rest
  defer to the next round keeping their seq;
* per-host PAGE budget (``max_pages_per_host``, the host-quota crawler
  policy): a host may be fetch-ATTEMPTED at most that many times over
  the whole crawl.  Within a round selection is capped at the host's
  remaining quota; frontier rows of a host whose quota is already
  exhausted at round start are DROPPED (recorded as stage="host_budget"
  errors, never deferred -- deferral would stall termination).  The
  quota counts selected rows (fetch attempts), not successful fetches,
  and is spent only after the round's selection completes;
* content dedup (``dedup_content``, the calendar-trap / mirror
  defense): a fetched page whose extracted-text md5 digest was already
  seen in a PRIOR round is still visited and still emits its item, but
  its links are NOT enqueued.  The digest set snapshots at round start
  -- two duplicate pages fetched in the same wave both expand (the only
  semantics a concurrent wave of fetches can honestly implement; their
  links dedup at enqueue anyway) -- and this round's digests commit at
  the round barrier.

The Ray engine's conformance tests (tests/test_simple_crawler.py,
tests/test_contrib_concurrent.py -- ports of pomp's e2e tests named by
BASELINE.json north_star) compare visited set and per-round order against
this loop.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pomp_ray.functions.textfns import (
    html_extract_links,
    html_extract_text,
    html_extract_title,
    url_canonicalize,
    url_host,
    url_join,
    url_path,
)


# redirect stand-in pages (see stages/fetch.py REDIRECT semantics);
# the oracle re-implements target parsing independently of fetch.py
_REDIR_PREFIX = b'<html><head><meta http-equiv="refresh" content="0;url='
_MAX_REDIRECTS = 3


def _redir_target(html):
    if html is None or not html.startswith(_REDIR_PREFIX):
        return None
    rest = html[len(_REDIR_PREFIX):]
    j = rest.find(b'"')
    return rest[:j].decode("utf-8", "replace") if j >= 0 else None


@dataclass
class OracleResult:
    visited: list[dict] = field(default_factory=list)   # url, round, depth, seq
    items: list[dict] = field(default_factory=list)     # url,title,text,n_links,round,seq
    errors: list[dict] = field(default_factory=list)    # url, stage, round
    seen: set[str] = field(default_factory=set)
    rounds: int = 0


from pomp_ray.functions.robotsfns import robots_blocked as _robots_blocked


def _robots_maps(robots_rows: list[dict]) -> tuple[dict, dict, dict]:
    disallow = {r["host"]: list(r.get("disallow_prefixes") or []) for r in robots_rows}
    allow = {r["host"]: list(r.get("allow_prefixes") or []) for r in robots_rows}
    delay = {r["host"]: float(r.get("crawl_delay") or 0.0) for r in robots_rows}
    return disallow, allow, delay


def crawl_oracle(
    corpus: dict[str, bytes],
    seeds: list[dict],
    robots_rows: list[dict] | None = None,
    mode: str = "bfs",
    round_budget_s: float = 10.0,
    dfs_width: int = 1,
    best_width: int = 64,
    max_depth: int | None = None,
    max_rounds: int | None = None,
    priority_fn=None,
    max_pages_per_host: int | None = None,
    max_errors_per_host: int | None = None,
    dedup_content: bool = False,
    priority_aging: int = 0,
    url_allow: str | None = None,
    url_deny: str | None = None,
    max_visited: int | None = None,
    max_text_bytes: int | None = None,
    same_host_only: bool = False,
    max_links_per_page: int | None = None,
    max_frontier_rows: int | None = None,
) -> OracleResult:
    """``corpus`` maps canonical url -> html bytes; ``seeds`` rows have
    url/priority/depth; ``robots_rows`` rows follow schemas.ROBOTS."""
    import re
    disallow, allow, delay = _robots_maps(robots_rows or [])
    allow_re = re.compile(url_allow) if url_allow else None
    deny_re = re.compile(url_deny) if url_deny else None
    res = OracleResult()
    frontier: list[dict] = []
    seq_counter = 0

    def try_enqueue(url: str, base: str | None, depth: int, priority: int,
                    rnd: int) -> None:
        nonlocal seq_counter
        full = url_join(base, url) if base else url
        canon = url_canonicalize(full)
        if not canon or canon in res.seen:
            return
        if base is not None:
            # link-scope allow/deny filters (seeds exempt): rejected
            # links vanish silently -- never seen, never errored
            if allow_re is not None and not allow_re.search(canon):
                return
            if deny_re is not None and deny_re.search(canon):
                return
            if same_host_only and url_host(canon) != url_host(base):
                return   # stay-on-site scope
        if max_depth is not None and depth > max_depth:
            return
        host = url_host(canon)
        path = url_path(canon)
        if _robots_blocked(path, disallow.get(host, ()),
                           allow.get(host, ())):
            res.seen.add(canon)
            res.errors.append({"url": canon, "stage": "robots", "round": rnd})
            return
        res.seen.add(canon)
        if priority_fn is not None and base is not None:
            # links are scored by the pluggable priority function on
            # (canonical url, depth); seeds keep their explicit priority
            priority = int(priority_fn([canon], [depth])[0])
        frontier.append(
            {"url": canon, "host": host, "depth": depth,
             "priority": priority, "seq": seq_counter}
        )
        seq_counter += 1

    for s in seeds:
        try_enqueue(s["url"], None, int(s.get("depth", 0)),
                    int(s.get("priority", 0)), rnd=0)

    rnd = 0
    budget_left: dict[str, int] = {}
    errors_by_host: dict[str, int] = {}
    seen_digests: set[bytes] = set()
    text_bytes_total = 0
    while frontier and (max_rounds is None or rnd < max_rounds) \
            and (max_visited is None or len(res.visited) < max_visited) \
            and (max_text_bytes is None
                 or text_bytes_total < max_text_bytes):
        if mode == "bfs":
            # FIFO: priority desc, then global enqueue order
            frontier.sort(key=lambda e: (-e["priority"], e["seq"]))
            width = len(frontier)
        elif mode == "best":
            # priority queue: same total order as BFS, cut at the width
            frontier.sort(key=lambda e: (-e["priority"], e["seq"]))
            width = best_width
        else:
            # LIFO: latest enqueued first
            frontier.sort(key=lambda e: (-e["priority"], -e["seq"]))
            width = dfs_width
        selected: list[dict] = []
        deferred: list[dict] = []
        per_host: dict[str, int] = {}
        budget = max_pages_per_host
        for e in frontier:
            if max_errors_per_host is not None and \
                    errors_by_host.get(e["host"], 0) >= max_errors_per_host:
                # fetch-error circuit breaker tripped (round-start
                # snapshot): drop through the host-cap channel, same
                # stage as an exhausted page budget
                res.errors.append({"url": e["url"], "stage": "host_budget",
                                   "round": rnd})
                continue
            if budget is not None and \
                    budget_left.get(e["host"], budget) <= 0:
                # host quota exhausted at round start: drop, never defer
                res.errors.append({"url": e["url"], "stage": "host_budget",
                                   "round": rnd})
                continue
            d = delay.get(e["host"], 0.0)
            cap = math.inf if d <= 0 else max(1, math.floor(round_budget_s / d))
            if budget is not None:
                cap = min(cap, budget_left.get(e["host"], budget))
            if len(selected) < width and per_host.get(e["host"], 0) < cap:
                per_host[e["host"]] = per_host.get(e["host"], 0) + 1
                selected.append(e)
            else:
                deferred.append(e)
        frontier = deferred
        if priority_aging:
            # aging (starvation fix): every deferred entry gains priority
            # each round it waits, eventually outranking fresh links
            for e in frontier:
                e["priority"] += priority_aging
        if budget is not None:
            for h, n in per_host.items():
                budget_left[h] = budget_left.get(h, budget) - n

        round_digests: list[bytes] = []
        for e in selected:
            html = corpus.get(e["url"])
            # follow redirect chains: final page's content/links, links
            # resolve against the FINAL url; mid-chain miss or >3 hops
            # (incl. loops) = fetch miss (spec shared with stages/fetch)
            base = e["url"]
            if html is not None:
                for _ in range(_MAX_REDIRECTS):
                    t = _redir_target(html)
                    if t is None:
                        break
                    tgt = url_canonicalize(url_join(base, t))
                    html = corpus.get(tgt)
                    if html is None:
                        break
                    base = tgt
                if _redir_target(html) is not None:
                    html = None
            if html is None:
                res.errors.append({"url": e["url"], "stage": "fetch", "round": rnd})
                errors_by_host[e["host"]] = \
                    errors_by_host.get(e["host"], 0) + 1
                continue
            res.visited.append(
                {"url": e["url"], "round": rnd, "depth": e["depth"], "seq": e["seq"]}
            )
            links = html_extract_links(html)
            text = html_extract_text(html)
            text_bytes_total += len(text.encode("utf-8", "surrogateescape"))
            res.items.append(
                {"url": e["url"], "title": html_extract_title(html),
                 "text": text, "n_links": len(links),
                 "round": rnd, "seq": e["seq"]}
            )
            if dedup_content:
                import hashlib
                dig = hashlib.md5(
                    text.encode("utf-8", "surrogateescape")).digest()
                round_digests.append(dig)
                if dig in seen_digests:
                    continue   # duplicate content: visit, never expand
            # per-page outlink cap: only the first N links in document
            # order expand (items keep the full n_links count)
            expand = (links if max_links_per_page is None
                      else links[:max_links_per_page])
            for href in expand:
                try_enqueue(href, base, e["depth"] + 1, 0, rnd)
        seen_digests.update(round_digests)
        if max_frontier_rows is not None \
                and len(frontier) > max_frontier_rows:
            # bounded-frontier admission (the 10^10-frontier safety
            # valve): keep the BEST cap rows by (priority desc, seq asc)
            # -- the "best"-mode total order -- and drop the overflow as
            # stage="frontier_cap" errors.  Applied at the round barrier,
            # after aging and all of the round's enqueues.
            order = sorted(frontier,
                           key=lambda e: (-e["priority"], e["seq"]))
            for e in order[max_frontier_rows:]:
                res.errors.append({"url": e["url"],
                                   "stage": "frontier_cap", "round": rnd})
            frontier = order[:max_frontier_rows]
        rnd += 1

    res.rounds = rnd
    return res
