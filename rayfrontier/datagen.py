"""Deterministic synthetic image+caption corpus (FIXTURES.md §1, input_hint schema).

Every row is a *pure function* of (DatagenConfig, image index): pixels, caption
mini-HTML, link structure, host assignment, English-ness, policy-ness and
duplicate groups are all derived from splitmix64 streams. That gives us:

* a pure ``SyntheticStore`` the sequential oracle fetches from (no files),
* a parquet pages table (hash-sharded by image_id) the Ray engine fetches from
  via keyed-lookup reads (SURVEY.md J5),
* per-row invariants: the engine's decoded pixels must match the pure
  generator's (allclose for ppm, PSNR>=40dB for qjpg) and captions must be
  string-equal (BASELINE.json input_hint).

Corpus layout on disk (``write_corpus``):
    <dir>/pages/shard=NNNN/part-*.parquet   image_id,bytes,w,h,fmt,caption,phash
    <dir>/seeds.parquet                     rank,domain
    <dir>/meta.json                         config echo + dictionary + ground truth

The link grammar reproduces everything the reference's link pass can observe
(src/crawler.py:90-138): privacy-keyword anchors, keyword-in-href-only anchors,
nested-markup anchors (skipped — bs4 ``.string is None``), javascript:/mailto:/
short junk, relative//protocol-relative/absolute hrefs, #fragments (stripped by
clean_link) and ?query params (kept — the reference deliberately keeps them),
dangling targets, and cross-host duplicate captions (same raw hrefs on two
hosts → the reference's global seen-dict skips the second occurrence).
"""

from __future__ import annotations

import json
import math
import os
from functools import lru_cache

import numpy as np

from .codecs import encode_image, phash64
from .config import DatagenConfig
from .functions.hashing import splitmix64
from .functions.minihtml import strip_text
from .functions.urltools import host_and_tail, host_of, path_tail

# ---------------------------------------------------------------- RNG plumbing


_MASK = 0xFFFFFFFFFFFFFFFF


def _mix(x: int) -> int:
    """Scalar splitmix64 finalizer (pure-int; hot path, avoids numpy scalars)."""
    z = (x + 0x9E3779B97F4A7C15) & _MASK
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _MASK
    return z ^ (z >> 31)


@lru_cache(maxsize=65536)
def _tag_hash(seed: int, tag: str) -> int:
    h = seed & _MASK
    for ch in tag:
        h = _mix(h ^ ord(ch))
    return h


def _u(seed: int, tag: str, *idx: int) -> float:
    """Uniform [0,1) from a splitmix64 stream keyed by (seed, tag, *idx).

    The mix chain is INLINED (identical arithmetic to :func:`_mix`): this is
    the innermost call of every synthetic draw — caption regeneration in the
    crawl's per-row validation makes ~600 mix steps per page, and the
    per-call function overhead alone was ~10% of the decode-kernel CPU."""
    h = _tag_hash(seed, tag)
    for i in idx:
        z = ((h ^ (i & _MASK)) + 0x9E3779B97F4A7C15) & _MASK
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _MASK
        h = z ^ (z >> 31)
    return h / 2.0**64


def _ui(seed: int, tag: str, lo: int, hi: int, *idx: int) -> int:
    """Uniform integer in [lo, hi] inclusive."""
    return lo + int(_u(seed, tag, *idx) * (hi - lo + 1))


# ---------------------------------------------------------------- vocabulary

_CONS = "btkdrmnslphvgz"
_VOW = "aeiou"


def _mk_word(seed: int, tag: str, i: int, syllables: int) -> str:
    w = []
    for s in range(syllables):
        w.append(_CONS[_ui(seed, f"{tag}c", 0, len(_CONS) - 1, i, s)])
        w.append(_VOW[_ui(seed, f"{tag}v", 0, len(_VOW) - 1, i, s)])
    return "".join(w)


@lru_cache(maxsize=8)
def vocabularies(seed: int) -> dict:
    """policy / generic / foreign vocab lists + the English dictionary set."""
    policy = [_mk_word(seed, "pw", i, 2 + i % 3) for i in range(120)]
    generic = [_mk_word(seed, "gw", i, 2 + i % 4) for i in range(300)]
    # foreign words: letters not in the dictionary, plus digit-bearing tokens
    foreign = [_mk_word(seed, "fw", i, 3) + "x" for i in range(80)]
    foreign += [f"w{i}rd{i % 7}" for i in range(40)]
    anchor_words = ["privacy", "policy", "notice", "terms", "contact", "read",
                    "more", "click", "here", "settings", "our", "the"]
    dictionary = frozenset(
        w.upper() for w in (policy + generic + anchor_words)
    )
    return {
        "policy": policy,
        "generic": generic,
        "foreign": foreign,
        "dictionary": dictionary,
    }


_HARM_CACHE: dict[int, float] = {}


def _zipf_word(words: list[str], seed: int, tag: str, *idx: int) -> str:
    """Zipf-ish pick: rank r with P(r) ∝ 1/(r+1).

    math.log/math.exp replace the numpy SCALAR calls (per-word numpy scalar
    dispatch was ~2 µs/word — the single largest caption-regeneration cost);
    bit-identical outputs verified exhaustively against the cached 300k/1M/3M
    corpora's stored captions (BASELINE round-4 notes).

    The cached harmonic term uses np.log — np.log and math.log differ by
    1 ulp for SOME n on this box (e.g. 54.0), and the stored corpora were
    generated with np.log, so the np value is the authoritative one for any
    future vocab size; it is computed once per size, so the numpy scalar
    cost is irrelevant. math.exp replaces only the PER-WORD call, and its
    bit-equality was verified exhaustively over every cached corpus draw."""
    n = len(words)
    harm = _HARM_CACHE.get(n)
    if harm is None:
        harm = _HARM_CACHE[n] = float(np.log(n + 1.0))
    u = _u(seed, tag, *idx)
    r = int(math.exp(u * harm)) - 1
    return words[min(r, n - 1)]


def _sentence(words: list[str], seed: int, tag: str, i: int, j: int) -> str:
    n = _ui(seed, f"{tag}n", 3, 14, i, j)
    ws = [_zipf_word(words, seed, f"{tag}w", i, j, k) for k in range(n)]
    u = _u(seed, f"{tag}s", i, j)
    if u < 0.06:
        ws = ws[:3]  # SHORT rule fodder
    if u > 0.94:
        ws.insert(0, f"{1 + (i + j) % 9}.")  # PRE_NOISE fodder
    sent = " ".join(ws)
    cap = _u(seed, f"{tag}cap", i, j)
    if cap < 0.85:
        sent = sent[0].upper() + sent[1:]
    term = _u(seed, f"{tag}t", i, j)
    if term < 0.8:
        sent += "."
    elif term < 0.9:
        sent += "?"
    # else: no terminal punctuation (END_PUNC rule fodder)
    return sent


def _paragraph(words: list[str], seed: int, tag: str, i: int, p: int, nmax: int = 6) -> str:
    n = _ui(seed, f"{tag}pn", 2, nmax, i, p)
    return " ".join(_sentence(words, seed, f"{tag}p{p}", i, j) for j in range(n))


# ---------------------------------------------------------------- host layout


@lru_cache(maxsize=8)
def host_layout(n_images: int, n_hosts: int, seed: int) -> tuple:
    """Skewed contiguous image ranges per host → (starts, sizes) arrays.

    Zipf-skewed sizes exercise the salting/politeness path (SURVEY.md §4 skew);
    every host owns >= 2 images (landing + at least one linkable page).
    """
    w = np.array([(_u(seed, "hsz", h)) ** 3 + 1e-3 for h in range(n_hosts)])
    budget = n_images - 2 * n_hosts
    if budget < 0:
        raise ValueError("n_images must be >= 2 * n_hosts")
    extra = np.floor(w / w.sum() * budget).astype(np.int64)
    sizes = extra + 2
    # distribute the rounding remainder deterministically
    rem = n_images - int(sizes.sum())
    for k in range(rem):
        sizes[k % n_hosts] += 1
    starts = np.zeros(n_hosts, dtype=np.int64)
    starts[1:] = np.cumsum(sizes)[:-1]
    return starts, sizes


def domain_name(h: int) -> str:
    return f"site{h:04d}.com"


def image_id(i: int) -> str:
    return f"img{i:08d}"


class HostMap:
    """Pure host/image index helpers derived from the layout."""

    def __init__(self, cfg: DatagenConfig):
        self.cfg = cfg
        self.starts, self.sizes = host_layout(cfg.n_images, cfg.n_hosts, cfg.seed)

    def host_index_of_image(self, i: int) -> int:
        return int(np.searchsorted(self.starts, i, side="right") - 1)

    def landing_image(self, h: int) -> int:
        return int(self.starts[h])

    def host_index_of_domain(self, domain: str) -> int | None:
        if domain.startswith("site") and domain.endswith(".com"):
            try:
                h = int(domain[4:8])
            except ValueError:
                return None
            if 0 <= h < self.cfg.n_hosts:
                return h
        return None

    def is_landing(self, i: int) -> bool:
        return i == self.landing_image(self.host_index_of_image(i))

    def sample_image_of_host(self, h: int, tag: str, *idx: int) -> int:
        s, n = int(self.starts[h]), int(self.sizes[h])
        return s + _ui(self.cfg.seed, tag, 0, n - 1, *idx)


# ---------------------------------------------------------------- roles / text


def _role(cfg: DatagenConfig, hm: HostMap, i: int) -> str:
    if hm.is_landing(i):
        return "landing"
    if _u(cfg.seed, "role", i) < cfg.policy_rate:
        return "policy"
    return "regular"


def _is_foreign(cfg: DatagenConfig, i: int) -> bool:
    return _u(cfg.seed, "foreign", i) < cfg.foreign_rate


def _dup_template(cfg: DatagenConfig, hm: HostMap, i: int) -> int | None:
    """Some policy pages copy the caption of a deterministic template policy."""
    if _role(cfg, hm, i) != "policy" or _u(cfg.seed, "dup", i) >= cfg.dup_rate:
        return None
    for t in range(12):
        j = _ui(cfg.seed, "dupt", 0, cfg.n_images - 1, i, t)
        if j != i and _role(cfg, hm, j) == "policy" and _dup_raw(cfg, j) is None:
            return j
    return None


def _dup_raw(cfg: DatagenConfig, i: int) -> bool | None:
    """Template-eligibility check without recursion (templates never duplicate)."""
    if _u(cfg.seed, "dup", i) >= cfg.dup_rate:
        return None
    return True


def find_policy_of_host(cfg: DatagenConfig, hm: HostMap, h: int, tag: str, *idx: int) -> int:
    """Deterministic pick of a policy-role image on host h (fallback: any page)."""
    for t in range(24):
        j = hm.sample_image_of_host(h, f"{tag}s{t}", *idx)
        if _role(cfg, hm, j) == "policy":
            return j
    return hm.sample_image_of_host(h, f"{tag}fb", *idx)


# ---------------------------------------------------------------- anchors


def _href_and_text(cfg: DatagenConfig, hm: HostMap, i: int, a: int) -> tuple[str, str, bool]:
    """One anchor for page i: (href, anchor_html_inner, nested_markup)."""
    seed = cfg.seed
    h = hm.host_index_of_image(i)
    kind = _u(seed, "akind", i, a)
    # pick a target
    if kind < 0.45:  # same-host target
        tgt = find_policy_of_host(cfg, hm, h, f"atgt{a}", i)
        tgt_host = h
    elif kind < 0.80:  # cross-host target
        tgt_host = _ui(seed, "axh", 0, cfg.n_hosts - 1, i, a)
        tgt = find_policy_of_host(cfg, hm, tgt_host, f"axt{a}", i)
    elif kind < 0.86:  # dangling target
        tgt = cfg.n_images + _ui(seed, "adang", 0, 999, i, a)
        tgt_host = _ui(seed, "adh", 0, cfg.n_hosts - 1, i, a)
    elif kind < 0.92:  # javascript junk
        return "javascript:void(0)", "Privacy settings", False
    elif kind < 0.96:  # mailto junk
        return f"mailto:privacy@{domain_name(h)}", "privacy contact", False
    else:  # too-short junk
        return "ab", "privacy", False

    iid = image_id(tgt)
    form = _u(seed, "aform", i, a)
    if tgt_host == h and form < 0.5:
        href = "/" + iid if form < 0.35 else iid  # relative (root / bare)
    elif form < 0.65:
        href = f"//{domain_name(tgt_host)}/{iid}"  # protocol-relative
    else:
        href = f"http://{domain_name(tgt_host)}/{iid}"  # absolute
    if _u(seed, "aq", i, a) < cfg.extra_query_rate:
        qsel = _u(seed, "aqs", i, a)
        href += "?lang=en&topic=privacy" if qsel < 0.5 else "?ref=home&v=2"
    if _u(seed, "afr", i, a) < cfg.fragment_rate:
        href += "#section-" + str(_ui(seed, "afri", 1, 9, i, a))

    tsel = _u(seed, "atext", i, a)
    if tsel < 0.45:
        return href, "Privacy Policy", False
    if tsel < 0.60:
        return href, "Our privacy notice", False
    if tsel < 0.70:
        return href, "<b>Privacy</b>", True  # nested markup → bs4 .string is None
    if tsel < 0.85:
        return href, "read more", False  # keyword only if href carries it
    return href, "terms and conditions", False


# ---------------------------------------------------------------- captions


def caption_html(cfg: DatagenConfig, i: int, hm: HostMap | None = None) -> str:
    """Deterministic mini-HTML caption of image i."""
    hm = hm or HostMap(cfg)
    seed = cfg.seed
    dup = _dup_template(cfg, hm, i)
    if dup is not None:
        return caption_html(cfg, dup, hm)
    role = _role(cfg, hm, i)
    voc = vocabularies(seed)
    if _is_foreign(cfg, i):
        words = voc["foreign"]
    elif role == "policy":
        words = voc["policy"]
    else:
        words = voc["generic"]

    parts: list[str] = []
    title = " ".join(
        _zipf_word(words, seed, "ttl", i, k).capitalize() for k in range(_ui(seed, "ttln", 2, 5, i))
    )
    parts.append(f"<h1>{title}</h1>")
    if _u(seed, "junk", i) < 0.15:
        parts.append("<script>var x = 1;</script>")
    if _u(seed, "style", i) < 0.1:
        parts.append("<style>.c{color:red}</style>")

    npar = _ui(seed, "npar", 1, 4 if role != "policy" else 6, i)
    for p in range(npar):
        parts.append(f"<p>{_paragraph(words, seed, 'bp', i, p)}</p>")

    if _u(seed, "haslist", i) < 0.5:
        if _u(seed, "colon", i) < 0.5:
            parts.append(f"<p>{_sentence(words, seed, 'cp', i, 0).rstrip('.?')}:</p>")
        nli = _ui(seed, "nli", 2, 5, i)
        lis = "".join(
            f"<li>{_sentence(words, seed, f'li{k}', i, 0)}</li>" for k in range(nli)
        )
        tag = "ul" if _u(seed, "ltag", i) < 0.7 else "ol"
        parts.append(f"<{tag}>{lis}</{tag}>")

    lo, hi = cfg.links_per_page
    nanchors = _ui(seed, "nanch", lo, hi, i)
    if role == "landing":
        nanchors = max(nanchors, 2)
    for a in range(nanchors):
        href, inner, _nested = _href_and_text(cfg, hm, i, a)
        parts.append(f'<a href="{href}">{inner}</a>')

    if _u(seed, "h2", i) < 0.4:
        parts.append(f"<h2>{_paragraph(words, seed, 'h2', i, 0, nmax=2)}</h2>")
        parts.append(f"<p>{_paragraph(words, seed, 'tail', i, 0)}</p>")
    return "".join(parts)


def pixels_of(cfg: DatagenConfig, i: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 image for index i."""
    w = _ui(cfg.seed, "imw", cfg.min_dim, cfg.max_dim, i)
    h = _ui(cfg.seed, "imh", cfg.min_dim, cfg.max_dim, i)
    rng = np.random.Generator(np.random.PCG64(int(splitmix64(np.uint64(cfg.seed * 1_000_003 + i)))))
    yy, xx = np.mgrid[0:h, 0:w]
    base = ((yy * 255) // max(h - 1, 1))[..., None] * np.array([1, 0, 0]) + (
        (xx * 255) // max(w - 1, 1)
    )[..., None] * np.array([0, 1, 0])
    noise = rng.integers(0, 64, size=(h, w, 3))
    px = np.clip(base + noise, 0, 255).astype(np.uint8)
    return px


def fmt_of(cfg: DatagenConfig, i: int) -> str:
    return "qjpg" if _u(cfg.seed, "fmt", i) < cfg.qjpg_rate else "ppm"


def gen_row(cfg: DatagenConfig, i: int, hm: HostMap | None = None) -> dict:
    """The full input_hint row for image index i (pure)."""
    hm = hm or HostMap(cfg)
    px = pixels_of(cfg, i)
    fmt = fmt_of(cfg, i)
    return {
        "image_id": image_id(i),
        "bytes": encode_image(px, fmt),
        "w": np.int32(px.shape[1]),
        "h": np.int32(px.shape[0]),
        "fmt": fmt,
        "caption": caption_html(cfg, i, hm),
        "phash": np.int64(phash64(px)),
    }


# ---------------------------------------------------------------- fetch stores


class SyntheticStore:
    """Pure URL → caption-HTML store (the oracle's 'network').

    Fetch succeeds iff scheme is http(s), the host is a synthetic domain, and
    the path is empty (landing page) or that host's own image_id. Query strings
    and ports are ignored by the server, like a real origin would.
    """

    def __init__(self, cfg: DatagenConfig):
        self.cfg = cfg
        self.hm = HostMap(cfg)

    def resolve(self, url: str) -> int | None:
        """URL → image index, or None (fetch failure)."""
        # scheme check without the url.lower() allocation (hot replay path)
        if not (
            url.startswith(("http://", "https://"))
            or url[:7].lower() == "http://"
            or url[:8].lower() == "https://"
        ):
            return None
        host, tail = host_and_tail(url)
        h = self.hm.host_index_of_domain(host)
        if h is None:
            return None
        # strip any query glued into the tail by odd URLs
        tail = tail.split("?", 1)[0]
        if tail == "":
            return self.hm.landing_image(h)
        if tail.startswith("img") and len(tail) == 11 and tail[3:].isdigit():
            j = int(tail[3:])
            if j < self.cfg.n_images and self.hm.host_index_of_image(j) == h:
                return j
        return None

    def fetch(self, url: str) -> str:
        j = self.resolve(url)
        return "" if j is None else caption_html(self.cfg, j, self.hm)


def seeds_list(cfg: DatagenConfig) -> list[str]:
    n = cfg.n_seeds or cfg.n_hosts
    return [domain_name(h) for h in range(min(n, cfg.n_hosts))]


def ground_truth_text(cfg: DatagenConfig, n_docs: int = 8) -> str:
    """Concatenated stripped text of n synthetic 'human-verified' policies.

    Mirrors get_ground_truth (src/verification/verify.py:122-140): per-doc
    stripped text + " " appended; built from the policy vocabulary so real
    policy pages score high TF-IDF cosine and generic pages score low.
    """
    voc = vocabularies(cfg.seed)["policy"]
    out = []
    for d in range(n_docs):
        paras = [
            _paragraph(voc, cfg.seed, f"gt{d}", 10_000_000 + d, p, nmax=8) for p in range(5)
        ]
        html = "".join(f"<p>{p}</p>" for p in paras)
        out.append(strip_text(html) + " ")
    return "".join(out)


def dictionary_set(cfg: DatagenConfig) -> frozenset[str]:
    return vocabularies(cfg.seed)["dictionary"]


# ---------------------------------------------------------------- corpus on disk


def shard_of(iid: str, n_shards: int) -> int:
    from .functions.hashing import hash_text

    return hash_text(iid) % n_shards


def write_corpus(out_dir: str, cfg: DatagenConfig, use_ray: bool = True) -> None:
    """Materialize the pages table (hash-sharded parquet), seeds and meta.

    Shard-partitioned layout is the keyed-lookup fetch path (SURVEY.md J5): a
    wave groups its URLs by shard and reads only those shard files with an
    ``image_id IN (...)`` row filter.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    pages_dir = os.path.join(out_dir, "pages")
    os.makedirs(pages_dir, exist_ok=True)

    def rows_to_table(rows: list[dict]) -> pa.Table:
        return pa.table(
            {
                "image_id": pa.array([r["image_id"] for r in rows], pa.string()),
                "bytes": pa.array([r["bytes"] for r in rows], pa.binary()),
                "w": pa.array([int(r["w"]) for r in rows], pa.int32()),
                "h": pa.array([int(r["h"]) for r in rows], pa.int32()),
                "fmt": pa.array([r["fmt"] for r in rows], pa.string()),
                "caption": pa.array([r["caption"] for r in rows], pa.string()),
                "phash": pa.array([int(r["phash"]) for r in rows], pa.int64()),
            }
        )

    if use_ray and cfg.n_images >= 4096:
        import ray.data as rd

        cfg_ref = cfg

        class GenShard:
            def __init__(self):
                self.hm = HostMap(cfg_ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                rows = [gen_row(cfg_ref, int(i), self.hm) for i in batch["id"].to_pylist()]
                t = rows_to_table(rows)
                import pyarrow.compute as pc  # noqa: F401

                shards = pa.array(
                    [shard_of(r["image_id"], cfg_ref.n_shards) for r in rows], pa.int32()
                )
                return t.append_column("shard", shards)

        ds = rd.range(cfg.n_images).map_batches(
            GenShard, batch_format="pyarrow", batch_size=1024, concurrency=(1, 16)
        )
        # coalesce to ONE file per shard: per-wave fetch reads shard fragments
        # by path, and Ray's read_parquet pays serial per-FILE metadata/path
        # overhead on the driver — 32 files resolve in ms, thousands take
        # seconds (measured: 21s of a 34s crawl). At real scale this maps to
        # "write few large fragments per partition", the same discipline.
        # image_id-sorted rows + small row groups → the per-wave IN-filter
        # fetch prunes whole row groups via parquet statistics instead of
        # scanning every shard end-to-end
        ds.groupby("shard").map_groups(
            lambda t: t.sort_by("image_id"), batch_format="pyarrow"
        ).write_parquet(
            pages_dir,
            partition_cols=["shard"],
            min_rows_per_file=cfg.n_images,
            row_group_size=1024,
        )
    else:
        hm = HostMap(cfg)
        by_shard: dict[int, list[dict]] = {}
        for i in range(cfg.n_images):
            r = gen_row(cfg, i, hm)
            by_shard.setdefault(shard_of(r["image_id"], cfg.n_shards), []).append(r)
        for s, rows in sorted(by_shard.items()):
            sdir = os.path.join(pages_dir, f"shard={s}")
            os.makedirs(sdir, exist_ok=True)
            pq.write_table(rows_to_table(rows), os.path.join(sdir, "part-0.parquet"))

    seeds = seeds_list(cfg)
    pq.write_table(
        pa.table(
            {
                "rank": pa.array(range(1, len(seeds) + 1), pa.int64()),
                "domain": pa.array(seeds, pa.string()),
            }
        ),
        os.path.join(out_dir, "seeds.parquet"),
    )
    with open(os.path.join(out_dir, "meta.json"), "w") as fp:
        json.dump(
            {
                "n_images": cfg.n_images,
                "n_hosts": cfg.n_hosts,
                "seed": cfg.seed,
                "n_shards": cfg.n_shards,
                "dictionary": sorted(dictionary_set(cfg)),
                "ground_truth": ground_truth_text(cfg),
            },
            fp,
        )
