"""End-to-end MIMO link simulation: bits -> QAM -> precode -> channel -> AWGN
-> equalize -> demap -> BER.

Reference: ``MimoSimulation/KerasFullSimulation.py:243-317`` (Sionna Keras
model: LDPC + QAM + ZF precoding + LS/perfect CSI + LMMSE + BER via ``sim_ber``)
and ``MimoSimulation/Predict.py:88-135`` (channel-predictor-in-the-loop).

The reference model's two run-time switches are first-class here too
(``KerasFullSimulation.py:200-317``): ``csi="perfect"|"ls"`` (genie channel
at the receiver vs least-squares estimation from Kronecker-style orthogonal
pilot slots) and ``domain="freq"|"time"`` (flat per-subcarrier channel vs the
full OFDM modulate -> tapped time channel -> demodulate chain from
:mod:`.ofdm`). FEC is in-framework (:mod:`.coding` conv/Viterbi,
:mod:`.ldpc` QC-LDPC) instead of Sionna's 5G LDPC — delta documented in
DESIGN.md. The whole Monte-Carlo BER loop is one jitted program with RNG keys.

The interesting capability is :func:`simulate_ber` with ``h_precode != h_true``:
precoding on a *predicted* channel while transmitting over the true one —
quantifying what channel-prediction NMSE costs in BER, which is exactly the
reference's end-to-end question.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from .estimation import lmmse_equalize
from .precoding import _as_complex, zf_precoder
from .qam import qam_demap_hard, qam_map


@dataclasses.dataclass(frozen=True)
class LinkConfig:
    qam_order: int = 4
    n_streams: int = 2  # spatial streams (== UE antennas here)


def _transmit(
    key: jax.Array,
    x_freq: jnp.ndarray,
    h_true: jnp.ndarray,
    noise_var,
    domain: str,
) -> jnp.ndarray:
    """Send ``x_freq [B, n_tx, n_sym, F]`` over ``h_true [B, n_rx, n_tx]``.

    ``domain="freq"``: per-subcarrier multiplication (the flat-channel model).
    ``domain="time"``: the reference's time branch
    (``KerasFullSimulation.py:253-276``): OFDM-modulate each symbol (CP =
    F//4), run the tapped time channel (flat channel = one tap), add the AWGN
    in the *time* domain, demodulate. With CP >= delay spread the two
    branches agree exactly — pinned by tests/test_coding_ofdm.py.

    Returns received ``[B, n_rx, n_sym, F]``.
    """
    from .ofdm import ofdm_demodulate, ofdm_modulate

    kr, ki = jax.random.split(key)
    if domain == "freq":
        y = jnp.einsum("brt,btnf->brnf", h_true, x_freq)
        noise = jnp.sqrt(noise_var / 2) * (
            jax.random.normal(kr, y.shape) + 1j * jax.random.normal(ki, y.shape)
        )
        return y + noise
    if domain != "time":
        raise ValueError(f"unknown domain {domain!r}")
    f = x_freq.shape[-1]
    cp = max(f // 4, 1)
    x_time = ofdm_modulate(x_freq, cp)  # [B, n_tx, n_sym, cp+F]
    # Flat MIMO channel: a single tap per (rx, tx) mixes antennas per time
    # sample. (Multipath: replace with per-(rx,tx) apply_time_channel over a
    # [B, n_rx, n_tx, K] tap tensor and sum over tx; cp >= K-1 keeps the
    # frequency-domain equivalence.)
    y_time = jnp.einsum("brt,btns->brns", h_true, x_time)
    noise = jnp.sqrt(noise_var / 2) * (
        jax.random.normal(kr, y_time.shape)
        + 1j * jax.random.normal(ki, y_time.shape)
    )
    y_time = y_time + noise
    return ofdm_demodulate(y_time, f, cp)


def _receive_csi(
    y: jnp.ndarray,
    h_eff: jnp.ndarray,
    n_pilot: int,
    csi: str,
):
    """Split pilots/data and produce the receiver's effective-channel estimate.

    ``y [B, n_rx, n_pilot + n_data_sym, F]``; pilot symbol ``s`` carried
    stream ``s`` with an all-ones pilot (Kronecker-style orthogonal pilots,
    the reference ResourceGrid's ``pilot_pattern="kronecker"``), so the LS
    estimate is ``h_hat[..., s, f] = y_pilot[..., s, f] / 1`` per subcarrier
    (Sionna ``LSChannelEstimator`` semantics, per resource element).

    Returns (y_data ``[B, n_rx, n_data_sym, F]``, h_rx ``[B, F, n_rx, S]``).
    """
    from .estimation import ls_estimate

    f = y.shape[-1]
    if csi == "perfect":
        h_rx = jnp.broadcast_to(
            h_eff[:, None], (h_eff.shape[0], f, *h_eff.shape[1:])
        )
        return y, h_rx
    if csi != "ls":
        raise ValueError(f"unknown csi {csi!r}")
    y_pilot = y[:, :, :n_pilot]  # [B, n_rx, S, F]
    h_hat = ls_estimate(y_pilot, jnp.ones((), y.dtype))
    h_rx = jnp.moveaxis(h_hat, 3, 1)  # [B, F, n_rx, S]
    return y[:, :, n_pilot:], h_rx


def _pilot_symbols(p: jnp.ndarray, n_streams: int) -> jnp.ndarray:
    """Precoded orthogonal pilot block: symbol ``s`` sends stream ``s`` only.

    ``p [B, n_tx, S]`` -> ``[B, n_tx, S(n_sym), 1(F)]``-broadcastable pilots:
    the transmitted pilot for symbol s is the precoder column s (all-ones
    pilot value), so the receiver sees ``h_eff[:, :, s]`` plus noise.
    """
    return jnp.swapaxes(p, 1, 2)[:, :, :, None].swapaxes(1, 2)  # [B,n_tx,S,1]


@partial(jax.jit, static_argnames=("cfg", "num_symbols", "csi", "domain"))
def simulate_ber(
    key: jax.Array,
    h_true: jnp.ndarray,
    h_precode: jnp.ndarray,
    ebno_db,
    cfg: LinkConfig = LinkConfig(),
    num_symbols: int = 64,
    csi: str = "perfect",
    domain: str = "freq",
):
    """Monte-Carlo BER for a batch of channels.

    Args:
      h_true:    ``[B, n_rx, n_tx]`` actual channel during data transmission.
      h_precode: ``[B, n_rx, n_tx]`` channel used to compute the ZF precoder
                 (pass ``h_true`` for perfect CSI; pass a predictor's output
                 for the prediction-in-the-loop BER).
      ebno_db:   per-bit SNR in dB.
      num_symbols: QAM symbols per stream per channel realization (= occupied
                 subcarriers of one OFDM data symbol).
      csi:       receiver channel knowledge: ``"perfect"`` genie effective
                 channel, or ``"ls"`` least-squares from n_streams orthogonal
                 pilot symbols (reference ``perfect_csi`` switch,
                 ``KerasFullSimulation.py:200-231``).
      domain:    ``"freq"`` flat per-subcarrier model or ``"time"`` full
                 OFDM modulate/channel/demodulate chain (reference's
                 time-domain branch).

    Returns: (ber, bits_total) — bit error rate and count.
    """
    import numpy as np

    h_true = _as_complex(h_true)
    h_precode = _as_complex(h_precode)
    b = h_true.shape[0]
    bps = int(np.log2(cfg.qam_order))
    n_bits = cfg.n_streams * num_symbols * bps
    n_pilot = cfg.n_streams if csi == "ls" else 0

    k_bits, k_noise = jax.random.split(key)
    bits = jax.random.bernoulli(k_bits, 0.5, (b, n_bits)).astype(jnp.float32)

    # Map to one OFDM data symbol per stream: [B, n_streams, F=num_symbols].
    syms = qam_map(bits, cfg.qam_order).reshape(b, cfg.n_streams, num_symbols)

    # ZF precode on the (possibly predicted) channel.
    p = zf_precoder(h_precode)  # [B, n_tx, n_rx(=streams)]
    x_data = jnp.einsum("bts,bsf->btf", p, syms)[:, :, None]  # [B,n_tx,1,F]
    if n_pilot:
        pil = jnp.broadcast_to(
            _pilot_symbols(p, cfg.n_streams),
            (b, p.shape[1], n_pilot, num_symbols),
        )
        x = jnp.concatenate([pil, x_data], axis=2)
    else:
        x = x_data

    # Es/N0 = Eb/N0 * bps (unit-energy constellation).
    esno = 10.0 ** (jnp.asarray(ebno_db) / 10.0) * bps
    noise_var = 1.0 / esno
    y = _transmit(k_noise, x, h_true, noise_var, domain)

    h_eff = h_true @ p  # [B, n_rx, n_streams]
    y_data, h_rx = _receive_csi(y, h_eff, n_pilot, csi)

    # LMMSE equalization per subcarrier with the receiver's CSI.
    y_f = y_data[:, :, 0].swapaxes(1, 2)  # [B, F, n_rx]
    x_hat = jax.vmap(
        jax.vmap(lambda yy, hh: lmmse_equalize(yy, hh, noise_var))
    )(y_f, h_rx)  # [B, F, n_streams]
    x_hat = jnp.swapaxes(x_hat, 1, 2).reshape(b, cfg.n_streams * num_symbols)

    bits_hat = qam_demap_hard(x_hat, cfg.qam_order).reshape(b, n_bits)
    errors = jnp.sum(jnp.abs(bits_hat - bits))
    return errors / (b * n_bits), b * n_bits


@partial(jax.jit, static_argnames=("cfg", "num_symbols", "fec", "csi", "domain"))
def simulate_coded_ber(
    key: jax.Array,
    h_true: jnp.ndarray,
    h_precode: jnp.ndarray,
    ebno_db,
    cfg: LinkConfig = LinkConfig(),
    num_symbols: int = 64,
    fec: str = "conv",
    csi: str = "perfect",
    domain: str = "freq",
):
    """Coded BER/BLER with a selectable in-framework FEC.

    The reference's coded link uses Sionna's 5G LDPC
    (``MimoSimulation/KerasFullSimulation.py:139-151``). Here:

    - ``fec="conv"``: K=7 rate-1/2 convolutional code + soft Viterbi
      (:mod:`.coding`) — any payload size (zero-tail fills the frame).
    - ``fec="ldpc"``: rate-1/2 QC-LDPC (n=648) + normalized min-sum BP
      (:mod:`.ldpc`, the 5G-LDPC algorithm family); the payload
      ``n_streams * num_symbols * bps`` must be a multiple of 648.

    One payload spans all streams/symbols of a channel realization, so BLER
    is per realization. Returns (ber, bler, info_bits_total).
    """
    import numpy as np

    from .coding import K, conv_encode, viterbi_decode
    from .qam import qam_llr

    h_true = _as_complex(h_true)
    h_precode = _as_complex(h_precode)
    b = h_true.shape[0]
    bps = int(np.log2(cfg.qam_order))
    n_coded = cfg.n_streams * num_symbols * bps

    k_bits, k_noise = jax.random.split(key)
    if fec == "ldpc":
        from .ldpc import ldpc_encode, make_qc_ldpc

        code = make_qc_ldpc()
        if n_coded % code.n:
            raise ValueError(
                f"LDPC payload {n_coded} must be a multiple of n={code.n}"
            )
        frames = n_coded // code.n
        n_info = frames * code.k
        info = jax.random.bernoulli(k_bits, 0.5, (b, frames, code.k)).astype(jnp.int32)
        coded = ldpc_encode(code, info).reshape(b, n_coded).astype(jnp.float32)
        info = info.reshape(b, n_info)
    else:
        n_info = n_coded // 2 - (K - 1)  # rate-1/2 + zero tail fills the frame
        info = jax.random.bernoulli(k_bits, 0.5, (b, n_info)).astype(jnp.int32)
        coded = conv_encode(info).astype(jnp.float32)  # [B, n_coded]

    syms = qam_map(coded, cfg.qam_order).reshape(b, cfg.n_streams, num_symbols)
    p = zf_precoder(h_precode)
    n_pilot = cfg.n_streams if csi == "ls" else 0
    x_data = jnp.einsum("bts,bsf->btf", p, syms)[:, :, None]
    if n_pilot:
        pil = jnp.broadcast_to(
            _pilot_symbols(p, cfg.n_streams),
            (b, p.shape[1], n_pilot, num_symbols),
        )
        x = jnp.concatenate([pil, x_data], axis=2)
    else:
        x = x_data
    # Es/N0 accounts for the code rate: Eb refers to *information* bits.
    esno = 10.0 ** (jnp.asarray(ebno_db) / 10.0) * bps * 0.5
    noise_var = 1.0 / esno
    y = _transmit(k_noise, x, h_true, noise_var, domain)

    h_eff = h_true @ p
    y_data, h_rx = _receive_csi(y, h_eff, n_pilot, csi)
    y_f = y_data[:, :, 0].swapaxes(1, 2)  # [B, F, n_rx]
    x_hat = jax.vmap(
        jax.vmap(lambda yy, hh: lmmse_equalize(yy, hh, noise_var))
    )(y_f, h_rx)
    x_hat = jnp.swapaxes(x_hat, 1, 2).reshape(b, cfg.n_streams * num_symbols)

    llr = qam_llr(x_hat[..., None], cfg.qam_order, noise_var).reshape(b, n_coded)
    if fec == "ldpc":
        from .ldpc import ldpc_decode

        decoded = ldpc_decode(
            code, llr.reshape(b, frames, code.n), num_iters=25
        ).reshape(b, n_info)
    else:
        decoded = viterbi_decode(llr, num_bits=n_info)
    bit_errs = jnp.sum(decoded != info, axis=-1)
    ber = jnp.sum(bit_errs) / (b * n_info)
    bler = jnp.mean((bit_errs > 0).astype(jnp.float32))
    return ber, bler, b * n_info
