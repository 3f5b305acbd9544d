"""Phoneme-duration extraction from attention maps.

Capability parity with the reference (utils/alignments.py:21-143): find the
cheapest monotonic path (moves right / down / down-right, cell cost
``max(attn) − attn``) from the top-left to the bottom-right of the
(mel × phoneme) attention grid, then count path cells per phoneme column
(one per mel row; the *last* column the path visits in a row owns that row).

TPU-first re-design: the reference builds an explicit sparse graph per sample
and runs serial scipy Dijkstra on the host — its known preprocessing
bottleneck. A monotonic-move grid is a DAG, so the shortest path is a
row-by-row dynamic program. The in-row dependency
``d[j] = c[j] + min(e[j], d[j-1])`` unrolls to a prefix minimum:

    d[j] = a[j] + min_{k<=j} (e[k] − a[k−1]),   a = cumsum(c),
    e[k] = min(prev[k], prev[k−1])

which is one ``cummin`` per row — so each row is pure vector work and the
whole table is a ``lax.scan`` over rows, vmapped over (batch·heads) maps and
jitted. Backtracking (O(M+N) pointer chasing, branchy and tiny) stays on
host, reading the distance table: the predecessor of (i, j) is the argmin of
dist over {(i−1,j), (i−1,j−1), (i,j−1)}.

Distances are offset by the constant cost[0,0] relative to the reference
(every path pays the start cell here); argmin backtracking and durations are
unaffected.
"""
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from transformertts_tpu.utils.metrics import attention_score
from transformertts_tpu.utils.spectrogram_ops import mel_lengths, phoneme_lengths

BIG = 1e9


def _dist_table(cost: jax.Array) -> jax.Array:
    """(M, N) cell costs → (M, N) shortest monotonic path distances."""
    def row_step(prev, c_row):
        prev_shift = jnp.concatenate([jnp.full((1,), BIG, prev.dtype),
                                      prev[:-1]])
        e = jnp.minimum(prev, prev_shift)                 # entry-from-above
        a = jnp.cumsum(c_row)
        a_shift = jnp.concatenate([jnp.zeros((1,), a.dtype), a[:-1]])
        d = a + jax.lax.cummin(e - a_shift)
        return d, d

    cost = cost.astype(jnp.float32)
    row0 = jnp.cumsum(cost[0])                            # only right-moves in row 0
    _, rest = jax.lax.scan(row_step, row0, cost[1:])
    return jnp.concatenate([row0[None, :], rest], axis=0)


dist_table = jax.jit(_dist_table)
dist_table_batch = jax.jit(jax.vmap(_dist_table))


def _backtrack_durations(dist: np.ndarray, m: int, n: int) -> np.ndarray:
    """Walk predecessors from (m-1, n-1) to (0, 0); count rows per column."""
    i, j = m - 1, n - 1
    # the path's column index is non-decreasing, so the last column visited
    # in a row (which owns the row) is the FIRST one seen while backtracking
    last_col = np.full(m, -1, np.int64)
    last_col[i] = j
    while i > 0 or j > 0:
        up = dist[i - 1, j] if i > 0 else np.inf
        diag = dist[i - 1, j - 1] if (i > 0 and j > 0) else np.inf
        left = dist[i, j - 1] if j > 0 else np.inf
        best = np.argmin([diag, up, left])                # prefer diagonal on ties
        if best == 0:
            i, j = i - 1, j - 1
        elif best == 1:
            i = i - 1
        else:
            j = j - 1
        if last_col[i] < 0:
            last_col[i] = j
    durations = np.zeros(n, np.int64)
    for i in range(m):
        durations[last_col[i]] += 1
    return durations


def extract_durations_with_dp(attention_map: np.ndarray) -> np.ndarray:
    """(mel M, phonemes N) attention → (N,) integer durations, Σ == M.

    Drop-in equivalent of the reference's
    ``extract_durations_with_dijkstra`` (utils/alignments.py:59-91).
    """
    attention_map = np.asarray(attention_map, np.float32)
    cost = attention_map.max() - attention_map
    dist = np.asarray(dist_table(jnp.asarray(cost)))
    return _backtrack_durations(dist, cost.shape[0], cost.shape[1])


# reference-compatible alias
extract_durations_with_dijkstra = extract_durations_with_dp


def duration_to_alignment_matrix(durations: np.ndarray) -> np.ndarray:
    """(N,) durations → (N, Σdur) binary alignment
    (reference utils/alignments.py:94-99), vectorized."""
    durations = np.asarray(durations, np.int64)
    total = int(durations.sum())
    ends = np.cumsum(durations)
    starts = ends - durations
    t = np.arange(total)
    return ((t[None, :] >= starts[:, None])
            & (t[None, :] < ends[:, None])).astype(np.float64)


def get_durations_from_alignment(batch_alignments, mels, phonemes,
                                 weighted: bool = False,
                                 backend: str = 'auto'
                                 ) -> Tuple[List[np.ndarray], List[np.ndarray],
                                            np.ndarray, np.ndarray, np.ndarray]:
    """Score heads → pick/weight attention → batched DP → durations.

    ``backend``: 'device' runs the scan-DP distance tables on the
    accelerator (one vmapped call for the whole batch); 'native' runs the
    threaded C++ DP (native/csrc/native_ops.cpp — the replacement for the
    reference's serial scipy Dijkstra); 'auto' prefers native when built.

    Semantics follow the reference (utils/alignments.py:102-143): mel/phoneme
    lengths are derived from padding; the first mel frame (start vector
    prediction) and first/last phoneme tokens (start/end) are dropped; heads
    are scored by jumpiness+peakiness+diagonality; either the score-weighted
    head sum or the best head feeds the path search. The distance tables for
    the whole batch are computed in ONE device call (padded, vmapped);
    only the O(M+N) backtracks run on host.
    """
    batch_alignments = np.asarray(batch_alignments)  # (B, H, M, N)
    mel_len = np.asarray(mel_lengths(jnp.asarray(mels), 0.0)) - 1
    phon_len = np.asarray(phoneme_lengths(jnp.asarray(phonemes))) - 1
    jumpiness, peakiness, diag_measure = attention_score(
        jnp.asarray(batch_alignments), jnp.asarray(mel_len),
        jnp.asarray(phon_len), r=1)
    jumpiness = np.asarray(jumpiness)
    peakiness = np.asarray(peakiness)
    diag_measure = np.asarray(diag_measure)
    attn_scores = diag_measure + jumpiness + peakiness

    b, _, m_pad, n_pad = batch_alignments.shape
    costs = np.full((b, m_pad, n_pad), BIG, np.float32)
    dims = []
    for idx in range(b):
        # all-padding samples (zero-filled remainder rows) degenerate to
        # empty grids; guard them so they yield empty durations
        m = max(int(mel_len[idx]) - 1, 0)
        n = max(int(phon_len[idx]) - 1, 0)
        al = batch_alignments[idx][:, 1:1 + m, 1:1 + n]
        if weighted:
            ref = np.sum(al * attn_scores[idx][:, None, None], axis=0)
        else:
            ref = al[np.argmax(attn_scores[idx])]
        costs[idx, :m, :n] = ref.max() - ref
        dims.append((m, n))

    if backend == 'auto':
        from transformertts_tpu import native
        backend = 'native' if native.available() else 'device'
    if backend == 'native':
        from transformertts_tpu import native
        ms = np.asarray([max(m, 1) for m, _ in dims], np.int32)
        ns = np.asarray([max(n, 1) for _, n in dims], np.int32)
        native_durs = native.duration_dp_batch(costs, ms, ns)
        dists = None
    else:
        dists = np.asarray(dist_table_batch(jnp.asarray(costs)))

    durations, final_alignment = [], []
    for idx in range(b):
        m, n = dims[idx]
        if m == 0 or n == 0:
            durations.append(np.zeros(n, np.int32))
            final_alignment.append(np.zeros((n, m)))
            continue
        if dists is None:
            dur = native_durs[idx, :n].astype(np.int64)
        else:
            dur = _backtrack_durations(dists[idx], m, n)
        assert dur.sum() == m, f'{dur.sum()} vs {m}'
        best_head = int(np.argmax(attn_scores[idx]))
        best_attention = batch_alignments[idx][best_head, 1:1 + m, 1:1 + n]
        final_alignment.append(best_attention.T
                               + duration_to_alignment_matrix(dur))
        durations.append(dur.astype(np.int32))
    return durations, final_alignment, jumpiness, peakiness, diag_measure
