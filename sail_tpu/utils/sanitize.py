"""Numeric sanitizers (SURVEY.md §5 "race detection / sanitizers").

The GPU world's sanitizers (cuda-memcheck, racecheck) have two TPU-side
analogs here:

  - DETERMINISM: any on-chip race shows up as bit-level divergence between
    repeated/re-sharded runs — `tools/determinism_check.py` checks that on
    the real chip, and the test suite pins layout-invariance on the CPU
    mesh.
  - NaN/Inf POISONING: the path tracer's failure mode for bad masking
    around singularities (CLAUDE.md double-where).  This module gives a
    lightweight runtime checker for it.

Use `check_finite(tree, name)` at subsystem boundaries (it raises with the
offending leaf path), or the `sanitized()` context manager in debugging
sessions to enable JAX's global NaN debugging (eager-mode re-runs of
jitted code on first NaN).
"""
from __future__ import annotations

from contextlib import contextmanager

import jax
import jax.numpy as jnp
import numpy as np


def check_finite(tree, name: str = "tree", raise_error: bool = True):
    """Host-side finiteness check of every array leaf in a pytree.

    Returns a list of (keypath, n_nonfinite) findings; with `raise_error`
    (default) raises FloatingPointError naming the first offending leaf.
    Forces a device→host sync — use at step boundaries, not per-op.
    """
    findings = []
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in flat:
        arr = np.asarray(leaf)
        if not np.issubdtype(arr.dtype, np.floating):
            continue
        bad = int((~np.isfinite(arr)).sum())
        if bad:
            findings.append((jax.tree_util.keystr(path), bad))
    if findings and raise_error:
        key, bad = findings[0]
        raise FloatingPointError(
            f"{name}{key}: {bad} non-finite value(s) "
            f"({len(findings)} leaves affected)")
    return findings


@contextmanager
def sanitized(nans: bool = True, infs: bool = False):
    """Context manager enabling JAX's global NaN/Inf debugging: jitted
    computations re-run op-by-op on the first bad value and raise at the
    producing primitive.  Debugging only — it disables async dispatch."""
    prev_n = jax.config.read("jax_debug_nans")
    prev_i = jax.config.read("jax_debug_infs")
    try:
        jax.config.update("jax_debug_nans", nans)
        jax.config.update("jax_debug_infs", infs)
        yield
    finally:
        jax.config.update("jax_debug_nans", prev_n)
        jax.config.update("jax_debug_infs", prev_i)


def assert_trees_bit_equal(a, b, name: str = ""):
    """Bit-exact pytree comparison (the determinism contract's assert)."""
    for (pa, la), (pb, lb) in zip(jax.tree_util.tree_flatten_with_path(a)[0],
                                  jax.tree_util.tree_flatten_with_path(b)[0]):
        aa, bb = np.asarray(la), np.asarray(lb)
        if aa.shape != bb.shape or (aa != bb).any():
            n = int((aa != bb).sum()) if aa.shape == bb.shape else -1
            raise AssertionError(
                f"{name}{jax.tree_util.keystr(pa)}: {n} differing values")
