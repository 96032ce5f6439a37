"""Sequential reference oracle.

A self-contained, single-process re-implementation of the reference crawler's
*sequential* semantics (``src/crawler.py:140-241`` + ``find_policy_links``
90-138 + the shared Manager dicts 342-351). This is the ground truth the Ray
engine must match exactly: crawl-log order, URL-seen set (raw hrefs + revisit
counts), dedup decisions and similarity scores (SURVEY.md §5, north rule).

Deliberately uses plain Python loops and dicts — it is the spec, not the
engine. Shares only the *pure kernels* (strip_text, candidate_links, tfidf,
sentence rules) with the engine, so the parity test exercises the engine's
distributed control flow, not a common implementation.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .config import CrawlConfig
from .functions.minihtml import candidate_links, strip_text
from .functions.tfidf import pair_cosine, term_counts
from .functions.textrules import is_english
from .functions.urltools import complete_link


@dataclass
class OracleResult:
    # crawl_log: one row per link attempt, in exact sequential order
    # (domain, url, sim, ok=access_success, valid, dup, seq)
    crawl_log: list[tuple] = field(default_factory=list)
    # domain outcome: domain -> one of failed_access / no_link / no_valid_link / successful
    domain_status: dict[str, str] = field(default_factory=dict)
    # per-domain incremental mean sim (src/crawler.py:41)
    domain_sim_avg: dict[str, float] = field(default_factory=dict)
    # raw href -> revisit count (the reference's link_dict, src/crawler.py:110-115)
    url_seen: dict[str, int] = field(default_factory=dict)
    # stripped text -> first domain (policy_dict, src/verification/verify.py:142-155)
    policy_first: dict[str, str] = field(default_factory=dict)
    # url -> (domain, output_index) for accepted policies
    accepted: dict[str, tuple[str, int]] = field(default_factory=dict)
    fetch_count: int = 0


def extract_links_sequential(
    full_url: str,
    html: str,
    link_dict: dict[str, int],
    keywords: tuple[str, ...],
) -> list[str]:
    """find_policy_links semantics (src/crawler.py:90-138) incl. seen-dict side
    effects: the *raw* href is checked/inserted before junk filters and URL
    completion; javascript/mailto/short hrefs still enter the seen dict."""
    links: list[str] = []
    for href in candidate_links(html, keywords):
        if href in link_dict:
            link_dict[href] += 1
            continue
        link_dict[href] = 0
        low = href.lower()
        if "javascript" in low:
            continue
        if len(href) < 3:
            continue
        if "mailto:" in low:
            continue
        links.append(complete_link(full_url, href))
    return list(dict.fromkeys(links))  # in-page order-preserving dedup (crawler.py:137)


def sequential_crawl(
    domains: list[str],
    store,
    cfg: CrawlConfig,
    ground_truth: str,
    dictionary: frozenset[str],
    robots=None,
) -> OracleResult:
    """The reference main loop, domain by domain, link list growing in-flight.

    ``store.fetch(url) -> str`` is the network. ``robots`` optionally maps a
    host to disallowed path prefixes (engine extension; None = reference
    behavior, no robots).
    """
    res = OracleResult()
    gt_counts = term_counts(ground_truth)

    def fetch(url: str) -> str:
        res.fetch_count += 1
        if robots is not None and robots.disallowed(url):
            return ""
        return store.fetch(url)

    def verify(contents: str) -> float:
        if not is_english(dictionary, contents, cfg.word_percentage, cfg.char_percentage):
            return 0.0
        return pair_cosine(gt_counts, contents)

    seq = 0
    for domain in domains:
        full_url = domain if "http" in domain else "http://" + domain
        domain_html = fetch(full_url)
        if strip_text(domain_html) == "":
            res.domain_status[domain] = "failed_access"
            res.domain_sim_avg[domain] = 0.0
            continue
        links = extract_links_sequential(full_url, domain_html, res.url_seen, cfg.keywords)
        if len(links) == 0:
            res.domain_status[domain] = "no_link"
            res.domain_sim_avg[domain] = 0.0
            continue

        sim_avg = 0.0
        n_links = 0
        any_valid = False
        depth_count = 0
        output_count = 0

        def add_link(url: str, sim: float, ok: bool, valid: bool, dup: bool):
            nonlocal sim_avg, n_links, seq, any_valid
            n_links += 1
            sim_avg = sim_avg + ((sim - sim_avg) / n_links)
            res.crawl_log.append((domain, url, sim, ok, valid, dup, seq))
            seq += 1
            if valid:
                any_valid = True

        for link in links:  # NOTE: links grows while iterating (crawler.py:182-201)
            link_html = fetch(link)
            link_contents = strip_text(link_html)
            if link_contents == "":
                add_link(link, 0.0, False, False, False)
                continue
            # expansion budget counts successfully-fetched pages, not levels
            if depth_count < cfg.max_crawler_depth:
                depth_count += 1
                for l in extract_links_sequential(full_url, link_html, res.url_seen, cfg.keywords):
                    if l not in links:
                        links.append(l)
            sim_score = verify(link_contents)
            if sim_score >= cfg.cos_sim_threshold:
                if link_contents in res.policy_first:
                    add_link(link, 0.0, True, True, True)
                    continue
                res.policy_first[link_contents] = domain
                output_count += 1
                res.accepted[link] = (domain, output_count)
                add_link(link, sim_score, True, True, False)
            else:
                if link_contents in res.policy_first:
                    add_link(link, 0.0, True, False, True)
                    continue
                res.policy_first[link_contents] = domain
                add_link(link, sim_score, True, False, False)

        res.domain_sim_avg[domain] = sim_avg
        res.domain_status[domain] = "successful" if any_valid else "no_valid_link"
    return res
