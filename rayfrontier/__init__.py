"""rayfrontier — a Ray-Data-native rebuild of the data-processing capabilities of
``rmjacobson/privacy-crawler-parser-tokenizer``.

The reference is a multiprocessing crawl → parse → tokenize pipeline over privacy
policies; this package re-expresses the same observable semantics as a distributed
URL-frontier + fetch scheduler over Arrow tables of image+caption pairs, driven by
``ray.data.Dataset`` pipelines (``map_batches`` over zero-copy Arrow batches, actor
pools for stateful stages).

Layout:
    functions/  pure kernels (url canonicalization, mini-HTML parse, TF-IDF, rules)
    sources/    storage layer (shard-partitioned parquet with Lance-style manifests)
    stages/     map_batches callables (decode, score, parse) — stateless + actor pools
    state/      stateful actors (cuckoo URL-seen shards, politeness token buckets)
    pipelines/  end-to-end Ray Data pipelines (crawl, parse, verify, dedup, stats)
    oracle.py   pure-Python sequential re-implementation of the reference semantics
    datagen.py  deterministic synthetic image+caption corpus (input_hint schema)
"""

__version__ = "0.1.0"
