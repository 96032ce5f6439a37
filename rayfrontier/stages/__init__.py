"""map_batches callables: stateless batch transforms (plain functions) and
stateful actor-pool stages (callable classes, setup once per actor in
``__init__``, work per Arrow batch in ``__call__``) — SURVEY.md §2.3/§2.4."""
