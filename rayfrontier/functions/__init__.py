"""Pure, deterministic kernels shared by the Ray engine and the sequential oracle.

Everything here is importable from both the driver and Ray workers, has no Ray
dependency, and is the single source of truth for transform semantics (parity
between engine and oracle is by construction — see SURVEY.md §7).
"""
