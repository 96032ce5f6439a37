"""URL kernels.

``clean_link`` reproduces the reference's fragment strip (``src/crawler.py:77-88``;
query-strip is deliberately disabled there, line 87 — we keep that).

``canonicalize`` is the north-rule extension: full RFC 3986 normalization
(lowercase scheme/host, default-port removal, dot-segment resolution, percent-
encoding uppercasing) + query-param sort. The crawl engine keys its URL-seen
cuckoo filter on raw hrefs for reference parity (the reference checks the *raw*
href against its seen dict before completing the URL, ``src/crawler.py:111-115``)
and exposes ``canonicalize`` as the frontier key.

``complete_link`` reproduces the reference's relative-URL completion
(``src/crawler.py:118-135``): absolute iff "http" occurs anywhere in the href;
``//x`` → ``http://x``; ``/x`` → base+path; bare → base+"/"+href.
"""

from __future__ import annotations

import re
from urllib.parse import quote, unquote, urlsplit, urlunsplit

_DEFAULT_PORTS = {"http": "80", "https": "443"}
_PCT_RE = re.compile(r"%[0-9a-fA-F]{2}")


def clean_link(link: str) -> str:
    """Strip #fragment only — exact reference semantics (src/crawler.py:77-88)."""
    return link.split("#", 1)[0]


def complete_link(base_url: str, href: str) -> str:
    """Reference completion rules (src/crawler.py:118-135), minus seen/junk checks.

    ``base_url`` is the *domain landing* URL — the reference completes relative
    links found on policy pages against the domain root, not the policy URL.
    """
    if "http" in href:
        return clean_link(href)
    if href[0] != "/":
        return clean_link(base_url + "/" + href)
    if href[:2] == "//":
        return clean_link("http://" + href[2:])
    return clean_link(base_url + href)


def _norm_pct(s: str) -> str:
    """Uppercase percent-escapes, decode unreserved characters."""
    # decode then re-encode with a conservative safe set
    return quote(unquote(s), safe="/:@!$&'()*+,;=~.-_")


def _remove_dot_segments(path: str) -> str:
    out: list[str] = []
    for seg in path.split("/"):
        if seg == "..":
            if out and out[-1] != "":
                out.pop()
        elif seg != ".":
            out.append(seg)
    norm = "/".join(out)
    if path.startswith("/") and not norm.startswith("/"):
        norm = "/" + norm
    return norm


def canonicalize(url: str) -> str:
    """RFC 3986 canonical form + sorted query params (north-rule frontier key).

    - lowercase scheme and host, strip default port and trailing host dot
    - resolve ./.. path segments; empty path → "/"
    - sort query parameters by (key, value), drop the fragment
    - normalize percent-encoding
    """
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return url.strip()
    scheme = (parts.scheme or "http").lower()
    host = (parts.hostname or "").lower().rstrip(".")
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    if parts.username:
        cred = parts.username + (f":{parts.password}" if parts.password else "")
        netloc = f"{cred}@{netloc}"
    path = _norm_pct(_remove_dot_segments(parts.path)) or "/"
    if parts.query:
        # normalize BEFORE sorting: sorting raw segments and then encoding is
        # not idempotent (e.g. "{" sorts after "0" raw but "%7B" sorts before)
        pairs = sorted(_norm_pct(seg) for seg in parts.query.split("&") if seg)
        query = "&".join(pairs)
    else:
        query = ""
    return urlunsplit((scheme, netloc, path, query, ""))


def host_of(url: str) -> str:
    """Lowercased host of a URL ("" if unparseable)."""
    try:
        return (urlsplit(url).hostname or "").lower()
    except ValueError:
        return ""


def path_tail(url: str) -> str:
    """Last non-empty path segment (the image_id in the synthetic universe)."""
    try:
        path = urlsplit(url).path
    except ValueError:
        return ""
    segs = [s for s in path.split("/") if s]
    return segs[-1] if segs else ""


def host_and_tail(url: str) -> tuple[str, str]:
    """(lowercased host, last non-empty path segment) in ONE parse.

    The crawl replay resolves every URL it touches, every wave — two
    urlsplit() calls per resolve were a measured ~1.5 s of driver-serial
    time per bench crawl. The fast path handles the plain
    ``http(s)://host/segment...`` shape; anything with a port, userinfo,
    query, fragment, IPv6 bracket, backslash, or whitespace falls back to
    the urlsplit-based kernels (a parity test pins fast ≡ fallback on the
    tricky shapes).
    """
    if url.startswith("http://"):
        rest = url[7:]
    elif url.startswith("https://"):
        rest = url[8:]
    else:
        return host_of(url), path_tail(url)
    if (
        "?" in rest or "#" in rest or "@" in rest or "[" in rest
        or "\\" in rest or " " in rest or "\t" in rest
        or "\n" in rest or "\r" in rest
    ):
        return host_of(url), path_tail(url)
    slash = rest.find("/")
    if slash < 0:
        netloc, path = rest, ""
    else:
        netloc, path = rest[:slash], rest[slash:]
    if ":" in netloc:
        return host_of(url), path_tail(url)
    segs = [s for s in path.split("/") if s]
    return netloc.lower(), (segs[-1] if segs else "")
