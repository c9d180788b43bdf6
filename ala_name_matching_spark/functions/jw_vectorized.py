"""Batch-vectorized Jaro-Winkler over numpy char matrices.

The pair scorer's only python kernel is Jaro-Winkler (no Spark built-in
exists; the reference applies Smith-Waterman-Gotoh per candidate,
MatchMetrics.java:158-166 -- JW is the sanctioned substitute). The scalar
python implementation (functions/similarity.jaro_winkler) costs ~40 us/pair;
at 10^12-turn scale the pair table is O(10^13) rows and the string kernel IS
the pipeline's CPU budget, so this module recasts the whole Arrow batch as a
(batch, JW_CAP) uint32 char matrix and runs the Jaro match/transposition
steps as numpy array ops -- the per-pair python interpreter loop disappears.

Algorithm notes (exactly equivalent to the scalar version, property-tested
in tests/test_similarity.py):
  * greedy match step: loop over the 64 char positions of s1 (fixed, small);
    per position a vectorized first-unmatched-in-window argmax across the
    whole batch. O(CAP * batch * CAP) elementwise bool ops, all in C.
  * transpositions: stable-argsort the match flags to gather matched chars
    in order, compare the two gathered matrices.
  * Winkler boost: vectorized common-prefix-of-4 + 0.1 scale, applied where
    jaro > 0.7 (the standard boost threshold the scalar version uses).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ala_name_matching_spark.functions.similarity import JW_CAP


def _to_char_matrix(s: pd.Series, cap: int) -> tuple[np.ndarray, np.ndarray]:
    """(batch, cap) uint32 codepoint matrix (0-padded) + length vector."""
    vals = s.fillna("").astype(str).str.slice(0, cap)
    lens = vals.str.len().to_numpy(dtype=np.int64)
    width = max(int(lens.max(initial=0)), 1)
    padded = vals.str.pad(width, side="right", fillchar="\x00")
    blob = "".join(padded.tolist())
    mat = np.frombuffer(blob.encode("utf-32-le"), dtype=np.uint32).reshape(-1, width)
    return mat, lens


def _pad_to(mat: np.ndarray, width: int) -> np.ndarray:
    if mat.shape[1] == width:
        return mat
    out = np.zeros((mat.shape[0], width), dtype=mat.dtype)
    out[:, : mat.shape[1]] = mat
    return out


def jw_batch(a: pd.Series, b: pd.Series, prefix_scale: float = 0.1) -> np.ndarray:
    """Jaro-Winkler for aligned series; NaN where either side is null."""
    n = len(a)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    null_mask = a.isna().to_numpy() | b.isna().to_numpy()
    m1, len1 = _to_char_matrix(a, JW_CAP)
    m2, len2 = _to_char_matrix(b, JW_CAP)
    # pad both matrices to the batch's real max width (<= JW_CAP): the match
    # loop is O(width^2) per pair, so a batch of 20-char turns costs (20/64)^2
    # of the worst case instead of always paying the cap.
    cap = max(m1.shape[1], m2.shape[1])
    m1, m2 = _pad_to(m1, cap), _pad_to(m2, cap)

    out = np.zeros(n, dtype=np.float64)
    equal = (len1 == len2) & (m1 == m2).all(axis=1)
    out[equal] = 1.0

    todo = ~equal & ~null_mask & (len1 > 0) & (len2 > 0)
    if todo.any():
        idx = np.nonzero(todo)[0]
        # sort rows by s1 length descending: at step i of the match loop only
        # the prefix of rows with l1 > i is still active, so total work is
        # sum(l1)*cap elementwise ops instead of k*max(l1)*cap.
        order_by_len = np.argsort(-len1[idx], kind="stable")
        idx = idx[order_by_len]
        s1, s2 = m1[idx], m2[idx]
        l1, l2 = len1[idx], len2[idx]
        k = len(idx)
        window = np.maximum(l1, l2) // 2 - 1
        window = np.maximum(window, 0)
        pos = np.arange(cap, dtype=np.int64)

        matched1 = np.zeros((k, cap), dtype=bool)
        matched2 = np.zeros((k, cap), dtype=bool)
        # avail = "position in s2 exists and is not yet matched"; updated
        # incrementally instead of recomputing in_len2 & ~matched2 per step.
        avail = pos[None, :] < l2[:, None]
        max_l1 = int(l1.max())
        neg_l1 = -l1  # ascending for searchsorted
        for i in range(max_l1):
            # rows with l1 <= i are done; l1 is sorted descending so the
            # active rows are a shrinking prefix.
            act = int(np.searchsorted(neg_l1, -i, side="left"))
            if act == 0:
                break
            # window around i, available in s2, char-equal
            cand = (
                (np.abs(pos[None, :] - i) <= window[:act, None])
                & avail[:act]
                & (s2[:act] == s1[:act, i : i + 1])
            )
            has = cand.any(axis=1)
            j = cand.argmax(axis=1)  # first True
            rows = np.nonzero(has)[0]
            matched2[rows, j[rows]] = True
            avail[rows, j[rows]] = False
            matched1[rows, i] = True

        m = matched1.sum(axis=1)
        # gather matched chars in order via stable argsort of ~matched
        order1 = np.argsort(~matched1, axis=1, kind="stable")
        order2 = np.argsort(~matched2, axis=1, kind="stable")
        g1 = np.take_along_axis(s1, order1, axis=1)
        g2 = np.take_along_axis(s2, order2, axis=1)
        kth = pos[None, :] < m[:, None]
        # strcmp95 semantics: mismatch count halved by INTEGER division
        # (matches the scalar kernel and DuckDB's jaro_winkler_similarity
        # -- see similarity.jaro)
        trans = np.floor_divide(((g1 != g2) & kth).sum(axis=1), 2).astype(
            np.float64
        )

        with np.errstate(divide="ignore", invalid="ignore"):
            jaro = (m / l1 + m / l2 + (m - trans) / np.maximum(m, 1)) / 3.0
        jaro[m == 0] = 0.0

        # Winkler boost: common prefix (up to 4) where jaro > 0.7
        p4 = min(4, cap)
        pref_eq = (s1[:, :p4] == s2[:, :p4]) & (
            pos[None, :p4] < np.minimum(l1, l2)[:, None]
        )
        prefix = np.where(
            pref_eq.all(axis=1), p4, pref_eq.argmin(axis=1)
        ).astype(np.float64)
        boost = jaro > 0.7
        jaro = np.where(boost, jaro + prefix * prefix_scale * (1.0 - jaro), jaro)
        out[idx] = jaro

    out[null_mask] = np.nan
    return out
