"""Quasi-cyclic LDPC encoder + normalized min-sum belief-propagation decoder.

Reference: the link sim's FEC is Sionna's 5G LDPC encoder/decoder
(``MimoSimulation/KerasFullSimulation.py:139-151``). This module supplies an
in-framework LDPC capability: an IEEE-802.11n-style **quasi-cyclic** code
(block-circulant parity-check matrix with a block-lower-triangular parity
part, so encoding is exact back-substitution), plus a **normalized min-sum**
iterative decoder. The construction is parameterized (lift size, rate, seed)
rather than the 3GPP BG1/BG2 tables — documented delta: same algorithm family
and decoder as 5G LDPC, different prototype matrix.

TPU-native design notes:

- The code is defined by a small integer prototype matrix; all GF(2) work is
  expressed as XOR/roll on ``[z]``-sized blocks (``jnp.roll`` = circulant
  shift), so encoding is a fixed sequence of rolls and XORs — fully jittable,
  no bit-packing loops.
- The decoder keeps messages in a **dense padded check layout**
  ``[n_checks, dc_max]`` (every check of a QC block row has the same degree,
  so padding is minimal): check updates are row-wise two-min + sign-parity
  reductions over a tiny static axis, and variable updates **gather** each
  variable's incident messages via a precomputed ``[n_vars, dv_max]`` index
  table. No scatter and no ``segment_*`` ops anywhere — gathers and small-
  axis reductions are the layouts TPUs like, and unsorted-segment scatters
  miscompiled on the experimental axon TPU runtime (decode diverged on
  hardware while being correct on CPU; the dense formulation is exact on
  both). A fixed ``num_iters`` ``lax.scan`` keeps shapes static (no early
  exit — on TPU the iterations are cheap and uniform).
- ``vmap`` over codewords batches the whole decode.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class QCLDPC:
    """A lifted quasi-cyclic code: prototype ``proto`` with entries -1 (zero
    block) or shift s in [0, z); H = [A | T] with T block-lower-triangular,
    identity diagonal."""

    proto: tuple  # [mb][nb] int tuple-of-tuples
    z: int

    @property
    def mb(self) -> int:
        return len(self.proto)

    @property
    def nb(self) -> int:
        return len(self.proto[0])

    @property
    def kb(self) -> int:
        return self.nb - self.mb

    @property
    def n(self) -> int:
        return self.nb * self.z

    @property
    def k(self) -> int:
        return self.kb * self.z


def make_qc_ldpc(z: int = 27, kb: int = 12, mb: int = 12, seed: int = 0,
                 row_weight: int = 6) -> QCLDPC:
    """Construct a rate kb/(kb+mb) QC-LDPC prototype.

    Information part A: ``row_weight`` random circulant shifts per block row
    with simple 4-cycle avoidance (no two columns may repeat a shift
    difference within a column pair). Parity part T: dual-diagonal-style
    block-lower-triangular with identity (shift 0) blocks on the diagonal and
    one sub-diagonal identity per row — exact back-substitution encoding.
    """
    rng = np.random.default_rng(seed)
    nb = kb + mb
    proto = -np.ones((mb, nb), dtype=np.int64)

    # Parity part: identity diagonal + sub-diagonal (bidiagonal T).
    for i in range(mb):
        proto[i, kb + i] = 0
        if i > 0:
            proto[i, kb + i - 1] = 0

    # Information part with 4-cycle avoidance between column pairs.
    # diff[(c1, c2)] = set of (s1 - s2) mod z seen for rows covering both.
    diffs: dict = {}
    for i in range(mb):
        cols = rng.choice(kb, size=min(row_weight, kb), replace=False)
        for c in cols:
            for _ in range(50):  # rejection sampling for girth > 4
                s = int(rng.integers(0, z))
                ok = True
                for c2 in range(kb):
                    if c2 == c or proto[i, c2] < 0:
                        continue
                    d = (s - proto[i, c2]) % z
                    key = (min(c, c2), max(c, c2))
                    dset = diffs.setdefault(key, set())
                    dd = d if c < c2 else (-d) % z
                    if dd in dset:
                        ok = False
                        break
                if ok:
                    proto[i, c] = s
                    for c2 in range(kb):
                        if c2 == c or proto[i, c2] < 0:
                            continue
                        d = (s - proto[i, c2]) % z
                        key = (min(c, c2), max(c, c2))
                        dd = d if c < c2 else (-d) % z
                        diffs.setdefault(key, set()).add(dd)
                    break
    return QCLDPC(proto=tuple(tuple(int(v) for v in row) for row in proto), z=z)


def ldpc_encode(code: QCLDPC, info_bits: jnp.ndarray) -> jnp.ndarray:
    """Systematic encoding: ``info_bits`` int [..., k] -> codeword [..., n].

    Solves A u + T p = 0 over GF(2) by block back-substitution (T is
    block-bidiagonal with identity diagonal): p_i = sum_j rot(u_j, s_ij)
    xor p_{i-1}.
    """
    z, kb, mb = code.z, code.kb, code.mb
    u = info_bits.reshape(*info_bits.shape[:-1], kb, z)

    def row_syndrome(i):
        acc = jnp.zeros(u.shape[:-2] + (z,), info_bits.dtype)
        for j in range(kb):
            s = code.proto[i][j]
            if s >= 0:
                # circulant block: H_block @ u_j == roll(u_j, -s)
                acc = acc ^ jnp.roll(u[..., j, :], -s, axis=-1)
        return acc

    parts = []
    prev = jnp.zeros(u.shape[:-2] + (z,), info_bits.dtype)
    for i in range(mb):
        p_i = row_syndrome(i) ^ prev  # T identity diag, sub-diag identity
        parts.append(p_i)
        prev = p_i
    p = jnp.stack(parts, axis=-2)
    return jnp.concatenate(
        [u.reshape(*info_bits.shape[:-1], kb * z),
         p.reshape(*info_bits.shape[:-1], mb * z)], axis=-1
    )


@lru_cache(maxsize=None)
def _dense_adjacency(code: QCLDPC):
    """Padded adjacency tables for the gather-only decoder.

    Memoized per (hashable, frozen) code object: the tables are rebuilt in
    Python loops otherwise on every (num_iters, shape) retrace of
    :func:`ldpc_decode`/:func:`ldpc_syndrome` (ADVICE r4).

    Returns ``(check_vars [n_checks, dc_max] int, valid [n_checks, dc_max]
    bool, var_edges [n_vars, dv_max] int)`` where ``check_vars[c, j]`` is the
    variable on slot j of check c (pad 0, masked by ``valid``) and
    ``var_edges[v, i]`` indexes the flattened ``[n_checks*dc_max]`` message
    array (pad = n_checks*dc_max, pointing at an appended zero entry).
    """
    z = code.z
    block_cols = [[(j, s) for j, s in enumerate(row) if s >= 0]
                  for row in code.proto]
    dc_max = max(len(c) for c in block_cols)
    n_checks = code.mb * z
    check_vars = np.zeros((n_checks, dc_max), np.int64)
    valid = np.zeros((n_checks, dc_max), bool)
    for i, cols in enumerate(block_cols):
        for slot, (j, s) in enumerate(cols):
            for r in range(z):
                check_vars[i * z + r, slot] = j * z + (r + s) % z
                valid[i * z + r, slot] = True
    lists: list = [[] for _ in range(code.n)]
    for c in range(n_checks):
        for slot in range(dc_max):
            if valid[c, slot]:
                lists[check_vars[c, slot]].append(c * dc_max + slot)
    dv_max = max(len(l) for l in lists)
    var_edges = np.full((code.n, dv_max), n_checks * dc_max, np.int64)
    for v, l in enumerate(lists):
        var_edges[v, : len(l)] = l
    return check_vars, valid, var_edges


@partial(jax.jit, static_argnames=("code", "num_iters", "alpha"))
def ldpc_decode(code: QCLDPC, llr: jnp.ndarray, num_iters: int = 25,
                alpha: float = 0.75) -> jnp.ndarray:
    """Normalized min-sum decoding (dense check layout, gather-only).

    ``llr``: float [..., n], positive favors bit 0 (matches
    :func:`.qam.qam_llr`). Returns hard-decision info bits int [..., k].
    """
    cv_np, valid_np, ve_np = _dense_adjacency(code)
    cv = jnp.asarray(cv_np)          # [n_checks, dc_max]
    valid = jnp.asarray(valid_np)
    var_edges = jnp.asarray(ve_np)   # [n_vars, dv_max]

    lead = llr.shape[:-1]
    flat = llr.reshape(-1, code.n)

    def check_update(v2c):
        """v2c [n_checks, dc_max] -> c2v (invalid slots produce 0)."""
        mag = jnp.where(valid, jnp.abs(v2c), jnp.inf)
        sgn = jnp.where(valid & (v2c < 0), 1, 0)
        s_tot = jnp.sum(sgn, axis=1) % 2                       # parity
        m1 = jnp.min(mag, axis=1)
        is_min = (mag <= m1[:, None]) & valid
        big = jnp.where(is_min, jnp.inf, mag)
        m2 = jnp.min(big, axis=1)
        # Outgoing magnitude excluding self: non-min slots see m1; a UNIQUE
        # min slot sees m2; tied-min slots see m1 (the other tie).
        cnt = jnp.sum(is_min.astype(jnp.int32), axis=1)
        out_mag = jnp.where(
            is_min & (cnt[:, None] == 1), m2[:, None], m1[:, None]
        )
        out_sgn = (s_tot[:, None] + sgn) % 2
        c2v = alpha * jnp.where(out_sgn == 1, -out_mag, out_mag)
        return jnp.where(valid & jnp.isfinite(c2v), c2v, 0.0)

    def var_sum(c2v):
        """Per-variable sum of incident c2v messages — pure gather."""
        flatc = jnp.concatenate([c2v.reshape(-1), jnp.zeros((1,), c2v.dtype)])
        return jnp.sum(flatc[var_edges], axis=1)               # [n_vars]

    def decode_one(chan):
        def bp_iter(v2c, _):
            c2v = check_update(v2c)
            v_tot = chan + var_sum(c2v)
            v2c_new = v_tot[cv] - c2v                          # [n_checks, dc_max]
            return v2c_new, None

        v2c, _ = jax.lax.scan(bp_iter, chan[cv], None, length=num_iters)
        posterior = chan + var_sum(check_update(v2c))
        return (posterior < 0).astype(jnp.int32)

    hard = jax.vmap(decode_one)(flat)
    return hard.reshape(*lead, code.n)[..., : code.k]


def ldpc_syndrome(code: QCLDPC, codeword: jnp.ndarray) -> jnp.ndarray:
    """H @ c mod 2 (all-zero iff ``codeword`` is valid) — test/debug helper."""
    cv_np, valid_np, _ = _dense_adjacency(code)
    cv = jnp.asarray(cv_np)
    valid = jnp.asarray(valid_np)
    flat = codeword.reshape(-1, code.n)
    syn = jax.vmap(
        lambda c: jnp.sum(jnp.where(valid, c[cv], 0), axis=1) % 2
    )(flat)
    return syn.reshape(*codeword.shape[:-1], code.mb * code.z)
