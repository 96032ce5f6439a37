"""Stateful actor-pool components: sharded URL-seen cuckoo filters, per-host
politeness token buckets, robots caches (north-rule additions over the
reference's Manager dicts, SURVEY.md §2.4)."""
