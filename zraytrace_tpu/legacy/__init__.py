"""Superseded engines kept for history and A/B reference.

``bounce_kernel2`` is the round-2 dual-path texel-STALL megakernel —
replaced on every product path by the deferred-texel kernel
(ops/bounce_kernel3, 213M -> 725M+ rays/s on the official bench). It
remains importable for A/B runs (``ZRAYTRACE_BENCH_KERNEL=2``) and its
interpreter-mode tests still pin the counter contract. The round-1
kernel was deleted in round 3 (its shared helpers live in ops/common).
"""
