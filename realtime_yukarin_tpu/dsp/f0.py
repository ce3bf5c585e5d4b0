"""F0 estimation — vectorized YIN/CMND (JAX).

Plays the role of WORLD's Dio/Harvest + StoneMask (SURVEY.md §2b): the
reference's branchy candidate-selection C++ is reformulated as fixed-shape
array math (SURVEY.md §7 hard part (a)):

  * the squared-difference function d(l) is computed for ALL lags at once
    via FFT cross-correlation + running energies (Wiener-Khinchin style),
  * the "first dip below threshold" search becomes a masked argmax,
  * parabolic refinement plays StoneMask's role,
  * a masked octave-down verification (deeper dip near lag 2*tau wins)
    plus a 3-tap median filter replace Dio's multi-candidate voting.

Semantics match ``golden.reference.estimate_f0`` allclose.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from realtime_yukarin_tpu.config import DspConfig
from realtime_yukarin_tpu.dsp import primitives as prim
from realtime_yukarin_tpu.dsp.framing import extract_centered_frames, median3
from realtime_yukarin_tpu.ops import dft


@functools.lru_cache(maxsize=None)
def _decim_matrix(decim: int, half_width: int, out_len: int):
    """[decim*out_len + 2*half_width, out_len] banded anti-alias + downsample
    map (Dio's low-pass + decimate role as ONE MXU matmul per frame —
    per-frame application keeps streamed == offline structurally exact,
    since the map sees only the frame, never the buffer alignment)."""
    import numpy as np
    h = prim.f0_decim_filter(decim, half_width)
    FL = decim * out_len + 2 * half_width
    D = np.zeros((FL, out_len), np.float64)
    for m in range(out_len):
        D[m * decim: m * decim + 2 * half_width + 1, m] = h
    return D


@functools.lru_cache(maxsize=None)
def _running_energy_matrix(frame_len: int, window: int, lag_max: int):
    """[frame_len, lag_max+1] 0/1 band: e(l) = sum_{n=l}^{l+W-1} x^2[n].

    A lane-axis cumsum on TPU costs more than the rest of the F0 stage
    combined (measured ~6 ms/step at 128 streams); the same running
    energy as one banded MXU matmul is noise — and avoids the
    sq[l+W]-sq[l] cancellation of the prefix-sum formulation.
    """
    import numpy as np
    W = np.zeros((frame_len, lag_max + 1), np.float64)
    for l in range(lag_max + 1):
        W[l: l + window, l] = 1.0
    return W




def difference_function(frames: jnp.ndarray, window: int, lag_max: int
                        ) -> jnp.ndarray:
    """d[l] = sum_{n<W} (x[n]-x[n+l])^2 for l in [0, lag_max], per row.

    frames: [F, frame_len] with frame_len >= window + lag_max.
    Uses  d(l) = e0 + e(l) - 2 c(l)  with c as a DFT-matmul
    cross-correlation (ops.dft — no XLA TPU FFT on the hot path).
    The DFT size is frame_len rounded up to EVEN (a matmul DFT needs no
    pow2, but ops.dft's rfft bases treat bin n//2 as a self-conjugate
    Nyquist bin, which only holds for even n):  n-1 + l <= window-1 +
    lag_max < frame_len already makes the circular correlation linear —
    a[n] is zero wherever the wrap would land.
    """
    F, FL = frames.shape
    n = FL + (FL & 1)                                        # even DFT size
    a = jnp.zeros((F, n), frames.dtype).at[:, :window].set(
        frames[:, :window])
    b = jnp.zeros((F, n), frames.dtype).at[:, :FL].set(frames)
    c = dft.cross_correlation(a, b, n, lag_max + 1)           # [F, L+1]
    Wb = jnp.asarray(_running_energy_matrix(FL, window, lag_max),
                     frames.dtype)
    e = jnp.matmul(frames * frames, Wb,
                   precision=jax.lax.Precision.HIGH)          # [F, L+1]
    e0 = e[:, :1]
    return jnp.maximum(e0 + e - 2.0 * c, 0.0)


def cmnd(d: jnp.ndarray) -> jnp.ndarray:
    """Cumulative-mean-normalized difference; d'[0] = 1.

    The running sum is a triangular-ones MXU matmul (lane cumsums
    serialize on TPU; see dft.prefix_sum_matrix)."""
    F, L1 = d.shape
    M = jnp.asarray(dft.prefix_sum_matrix(L1 - 1), d.dtype)
    csum = jnp.matmul(d[:, 1:], M, precision=jax.lax.Precision.HIGH)
    lags = jnp.arange(1, L1, dtype=d.dtype)
    dp = jnp.where(csum > 0, d[:, 1:] * lags / csum, 1.0)
    return jnp.concatenate([jnp.ones((F, 1), d.dtype), dp], axis=1)


def estimate_f0(x: jnp.ndarray, num_frames: int, cfg: DspConfig,
                center_offset: int = 0) -> jnp.ndarray:
    """[T] -> f0 [F] in Hz (0 = unvoiced). Matches the golden estimator
    (decimated CMND search + median + candidate-lattice Viterbi +
    full-rate refinement).

    Under jit the power spectrogram here CSEs with the envelope stage's
    (identical subexpression), so the refinement costs only the cosine
    contractions; likewise the candidate extraction CSEs with the raw
    estimate's CMND."""
    from realtime_yukarin_tpu.dsp.envelope import power_spectrogram
    raw, cand_f0, cand_cost = f0_raw_and_candidates(x, num_frames, cfg,
                                                    center_offset)
    f0 = median3(raw)
    f0, choice = viterbi_snap(f0, cand_f0, cand_cost, cfg)
    P = power_spectrogram(x, num_frames, cfg, center_offset)
    f0 = voicing_revision(x, f0, choice, num_frames, cfg, center_offset,
                          P=P)
    return refine_f0_from_power(P, f0, cfg)


# Finite "infinity" for masked min-plus DP (inf - inf = nan; a finite
# sentinel keeps every where/min well-defined in float32).
_BIG = 1.0e6


def f0_candidates(x: jnp.ndarray, num_frames: int, cfg: DspConfig,
                  center_offset: int = 0
                  ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-K CMND dip candidates per frame (the Harvest candidate-lattice
    role, upstream:mmorise/World src/harvest.cpp GetF0Candidates).

    Returns (cand_f0 [F, K] in Hz with 0 = invalid slot, emis [F, K]
    Viterbi emission costs).  Candidates are the K deepest local minima
    of the CMND curve in [lag_min_d, lag_max_d], parabolic-refined
    exactly like the raw estimate.  Emission construction:

      cost_k = dip_k * (1+f0_rel_bias)^oct_k + octave_margin * oct_k
      emis_k = (cost_k - min_k cost_k) * reliability

    with oct_k = log2(lag_k / lag_min) and reliability = clip(1 -
    min_k dip_k / voicing_confidence_scale, 0, 1).  The RELATIVE per-octave
    penalty separates weak-fundamental from diplophonia (see
    DspConfig.f0_rel_bias); the reliability weight keeps strongly-
    aperiodic frames (onsets, breathy edges) from outvoting clean
    neighbors in the window DP; relative-to-best costs make emissions
    comparable across frames.  Frame-local.  Hot-path callers use
    ``f0_raw_and_candidates`` to share the CMND front half with the raw
    estimate explicitly (no CSE reliance).
    """
    dp, e0 = _cmnd_and_energy(x, num_frames, cfg, center_offset)
    return _candidates_from_cmnd(dp, e0, cfg)


def _candidates_from_cmnd(dp: jnp.ndarray, e0: jnp.ndarray, cfg: DspConfig
                          ) -> tuple[jnp.ndarray, jnp.ndarray]:
    K = cfg.f0_cand_k
    W = cfg.f0_window_d
    lmin, lmax = cfg.lag_min_d, cfg.lag_max_d
    fs = float(cfg.f0_fs_d)
    F = dp.shape[0]

    r = dp[:, lmin: lmax + 1]                                # [F, R]
    R = r.shape[1]
    prv = dp[:, lmin - 1: lmax]                              # lmin >= 2
    nxt = jnp.concatenate([dp[:, lmin + 1: lmax + 1],
                           jnp.full((F, 1), jnp.inf, r.dtype)], axis=1)
    is_min = (r <= prv) & (r <= nxt)
    vals = jnp.where(is_min, r, _BIG)
    cols = jnp.arange(R)
    cols_full = jnp.arange(dp.shape[1])
    frame_ok = e0 / W >= prim.SILENCE_POWER

    def pick_dp(t):
        return jnp.sum(jnp.where(cols_full[None, :] == t[:, None], dp, 0.0),
                       axis=1)

    import math
    gamma_exp = math.log2(1.0 + cfg.f0_rel_bias)
    f0s, costs, dips = [], [], []
    for _ in range(K):
        ck = jnp.min(vals, axis=1)
        ik = jnp.argmin(vals, axis=1)
        vals = jnp.where(cols[None, :] == ik[:, None], _BIG, vals)
        tau = ik + lmin
        # parabolic refinement (identical math to the raw estimate)
        dm1 = pick_dp(jnp.maximum(tau - 1, 0))
        dp1 = pick_dp(jnp.minimum(tau + 1, lmax))
        denom = dm1 - 2.0 * ck + dp1
        delta = jnp.where(jnp.abs(denom) > 1e-12,
                          0.5 * (dm1 - dp1) / jnp.where(denom == 0, 1.0,
                                                        denom), 0.0)
        delta = jnp.clip(delta, -1.0, 1.0)
        interior = (tau > lmin) & (tau < lmax)
        t_ref = tau.astype(dp.dtype) + jnp.where(interior, delta, 0.0)
        f0_k = fs / t_ref
        valid = ((ck < 0.5 * _BIG) & frame_ok
                 & (f0_k >= cfg.f0_floor) & (f0_k <= cfg.f0_ceil))
        oct_k = jnp.log2(tau.astype(dp.dtype) / float(lmin))
        cost = (ck * jnp.exp2(gamma_exp * oct_k)
                + cfg.octave_margin * oct_k)
        f0s.append(jnp.where(valid, f0_k, 0.0))
        costs.append(jnp.where(valid, cost, _BIG))
        dips.append(jnp.where(valid, ck, _BIG))
    cost = jnp.stack(costs, axis=1)                          # [F, K]
    dip = jnp.stack(dips, axis=1)
    m = jnp.min(cost, axis=1, keepdims=True)
    dmin = jnp.min(dip, axis=1, keepdims=True)
    r = jnp.clip(1.0 - dmin / cfg.voicing_confidence_scale, 0.0, 1.0)
    emis = jnp.where(cost >= 0.5 * _BIG, _BIG,
                     jnp.minimum((cost - m) * r, cfg.f0_emis_cap))
    return jnp.stack(f0s, axis=1), emis


def viterbi_snap(f0: jnp.ndarray, cand_f0: jnp.ndarray,
                 cand_cost: jnp.ndarray, cfg: DspConfig
                 ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Bounded-window Viterbi contour selection (Harvest contour-DP role;
    see DspConfig.f0_snap_halo/f0_trans_weight): each voiced frame is
    re-decided among its top-K CMND candidates by the minimum-cost path
    through the +-halo window — emission = candidate cost, transition =
    f0_trans_weight per octave of log-f0 jump between consecutive ACTIVE
    frames (voiced frames with >= 1 valid candidate; others pass
    through freely).  Per-frame windowed (NOT a whole-utterance DP), so
    the decision for frame i depends only on frames [i-H, i+H]: the
    streaming layer gets bit-exact streamed==offline with the same
    bounded lookahead the median snap had.

    The window may be ASYMMETRIC (cfg.f0_snap_left_eff left frames,
    cfg.f0_snap_halo right frames): only the RIGHT half costs lookahead
    in streaming — left frames' candidates are already cached — so the
    low-latency profile runs a causal DP (left=6, right=0) and keeps
    the full window's zero-octave-slip quality (see DspConfig
    .f0_snap_left).

    Vectorized fixed-shape: neighborhood stacks [F, Hl+Hr+1, K], the two
    half-passes unrolled as masked [F, K, K] min-plus contractions.
    Matches ``golden.reference.viterbi_snap``."""
    F = f0.shape[0]
    K = cand_f0.shape[1]
    Hl = cfg.f0_snap_left_eff
    Hr = cfg.f0_snap_halo
    if Hl == 0 and Hr == 0:
        # no window: the per-frame best candidate is still the rescue
        # hypothesis for the voicing revision
        k0 = jnp.argmin(cand_cost, axis=1)
        ks0 = jnp.arange(K)
        ch0 = jnp.sum(jnp.where(ks0[None, :] == k0[:, None], cand_f0, 0.0),
                      axis=1)
        return f0, ch0
    Wn = Hl + Hr + 1
    wt = jnp.asarray(cfg.f0_trans_weight, f0.dtype)

    f0_p = jnp.concatenate([jnp.zeros(Hl, f0.dtype), f0,
                            jnp.zeros(Hr, f0.dtype)])
    cf_p = jnp.concatenate([jnp.zeros((Hl, K), cand_f0.dtype), cand_f0,
                            jnp.zeros((Hr, K), cand_f0.dtype)])
    cc_p = jnp.concatenate([jnp.full((Hl, K), _BIG, cand_cost.dtype),
                            cand_cost,
                            jnp.full((Hr, K), _BIG, cand_cost.dtype)])
    nb_f = jnp.stack([cf_p[k: k + F] for k in range(Wn)], axis=1)
    nb_c = jnp.stack([cc_p[k: k + F] for k in range(Wn)], axis=1)
    nb_v = jnp.stack([f0_p[k: k + F] for k in range(Wn)], axis=1) > 0
    act = nb_v & jnp.any(nb_f > 0, axis=2)                  # [F, Wn]
    lf = jnp.log2(jnp.maximum(nb_f, 1e-6))                  # [F, Wn, K]

    def half_pass(idxs):
        """Min-plus message from the window edge into the center
        (transition into the center included, center emission not)."""
        msg = jnp.zeros((F, K), f0.dtype)
        lfp = jnp.zeros((F, K), f0.dtype)
        has = jnp.zeros((F,), bool)
        for j in idxs:
            a = act[:, j]
            trans = wt * jnp.abs(lf[:, j][:, None, :] - lfp[:, :, None])
            step = jnp.min(msg[:, :, None] + jnp.where(
                has[:, None, None], trans, 0.0), axis=1)     # [F, K]
            new = nb_c[:, j] + step
            msg = jnp.where(a[:, None], new, msg)
            lfp = jnp.where(a[:, None], lf[:, j], lfp)
            has = has | a
        tr = wt * jnp.abs(lf[:, Hl][:, None, :] - lfp[:, :, None])
        return jnp.min(msg[:, :, None] + jnp.where(
            has[:, None, None], tr, 0.0), axis=1)            # [F, K]

    alpha = half_pass(range(0, Hl))
    beta = half_pass(range(Wn - 1, Hl, -1))
    total = alpha + beta + nb_c[:, Hl]
    k_star = jnp.argmin(total, axis=1)
    ks = jnp.arange(K)
    choice = jnp.sum(jnp.where(ks[None, :] == k_star[:, None],
                               nb_f[:, Hl], 0.0), axis=1)
    apply = (f0 > 0) & act[:, Hl] & (choice > 0)
    # ``choice`` is also returned for UNVOICED frames (the center's
    # candidates exist even when the frame is not a path node): the
    # voicing revision uses it as the rescue hypothesis.
    return jnp.where(apply, choice, f0), choice


def voicing_revision(x: jnp.ndarray, f0: jnp.ndarray, choice: jnp.ndarray,
                     num_frames: int, cfg: DspConfig,
                     center_offset: int = 0,
                     P: jnp.ndarray | None = None) -> jnp.ndarray:
    """Full-rate band-evidence voicing revision (D4C LoveTrain role,
    upstream:mmorise/World src/d4c.cpp).  Frame-local given (f0, choice),
    so streaming caches stay exact.  Two rules (DspConfig voicing_*):

    DEMOTE: a voiced frame whose hop-aligned block window contains a
    near-silent block (min/mean block energy < voicing_block_ratio) is
    not confidently voiced — its wide spectral window leaked
    periodicity across a silence boundary.

    RESCUE: a CMND-unvoiced frame whose lattice ``choice`` candidate has
    low-band periodicity >= voicing_rescue_plow AND whose low band
    carries >= voicing_low_frac of the frame's spectral energy becomes
    voiced at the candidate (breathy/jittery voicing: periodic low band
    under high-band turbulence).  Rescue also requires the block-energy
    confidence, so silence-boundary frames cannot re-enter.

    Pass the shared power spectrogram via ``P`` (computed once per step;
    see dsp.envelope.power_spectrogram's CSE note); the extra cost is
    two block-sum reductions and one cosine contraction.
    """
    from realtime_yukarin_tpu.dsp.envelope import power_spectrogram
    N = cfg.fft_size
    fs = float(cfg.sample_rate)
    hop = cfg.hop
    M = cfg.voicing_blocks
    # one hop-grid framing yields every frame's M blocks: block m covers
    # [center_offset + m*hop, +hop), frame i's window is blocks
    # [i - M/2, i + M/2) — non-overlapping, so this is a reshape-cost
    # operation, not a second [F, fft]-scale materialization
    eb = extract_centered_frames(x, num_frames + M, hop, hop,
                                 center_offset - (M // 2) * hop + hop // 2)
    # DC-corrected block energies (see _cmnd_and_energy): a DC offset
    # would otherwise make every block's energy ~equal and disable the
    # silence-boundary DEMOTE rule entirely.  Subtract-then-square (not
    # the algebraic sum(x^2) - (sum x)^2/n form): at low gain under a
    # DC offset the algebraic form cancels two large f32 terms and the
    # rounding noise swamps the true variance.
    e = jnp.sum((eb - jnp.mean(eb, axis=-1, keepdims=True)) ** 2,
                axis=-1)                                # [F + M]
    be = jnp.stack([e[k: k + num_frames] for k in range(M)], axis=1)
    conf = jnp.min(be, axis=1) / (jnp.mean(be, axis=1) + 1e-20)
    energy_ok = conf >= cfg.voicing_block_ratio

    if P is None:
        P = power_spectrogram(x, num_frames, cfg, center_offset)
    freqs = jnp.arange(N // 2 + 1) * (fs / N)
    # DC + its Hann-leakage bins are excluded from the periodicity and
    # band-fraction evidence (see _periodicity_hp_mask): a DC-offset
    # input would otherwise dominate Pl and read as perfect low-band
    # periodicity at every lag.
    hp = jnp.asarray(_periodicity_hp_mask(cfg), P.dtype)
    w_low = (freqs < cfg.voicing_low_band_hz).astype(P.dtype) * hp
    Pl = P * w_low[None, :]
    low_frac = (jnp.sum(Pl, axis=1)
                / (jnp.sum(P * hp[None, :], axis=1) + 1e-20))
    lag = jnp.round(fs / jnp.maximum(choice, 1.0))
    rho = (2.0 + jnp.cos(2.0 * jnp.pi * lag / N)) / 3.0
    r0 = dft.autocorr_at_lag(Pl, jnp.zeros_like(lag), N)
    p_low = dft.autocorr_at_lag(Pl, lag, N) / (r0 + 1e-20) / rho

    rescue = ((f0 <= 0) & (choice > 0) & energy_ok
              & (p_low >= cfg.voicing_rescue_plow)
              & (low_frac >= cfg.voicing_low_frac))
    out = jnp.where(rescue, choice, f0)
    return jnp.where(energy_ok, out, 0.0)


def _periodicity_hp_mask(cfg: DspConfig):
    """[K] 0/1 mask excluding bins below 0.7*f0_floor from periodicity
    evidence (shared by refine_f0_from_power and voicing_revision; the
    golden reference mirrors it).

    A Hann-windowed DC offset leaks into bins 0..2; those bins add a
    near-constant term to the windowed autocorrelation at EVERY lag,
    which drags all periodicity ratios toward 1 — measured on the
    formant fixture at +0.1 DC, the subharmonic (octave-up) rule then
    halves the lag twice on most voiced frames.  Content below f0_floor
    carries no pitch information by definition, so masking it is free.
    """
    import numpy as np
    N = cfg.fft_size
    freqs = np.arange(N // 2 + 1) * (cfg.sample_rate / N)
    return (freqs >= 0.7 * cfg.f0_floor).astype(np.float64)


def refine_f0_from_power(P: jnp.ndarray, f0: jnp.ndarray, cfg: DspConfig,
                         iters: int = 2) -> jnp.ndarray:
    """Full-rate F0 refinement (StoneMask role, upstream:mmorise/World
    src/stonemask.cpp) on the shared Hann power spectrogram [F, K].

    The windowed-frame autocorrelation r(l) = irfft(P)[l] is evaluated at
    the three integer lags around the coarse period (FFT-free cosine
    contractions, ops/dft.py:autocorr_at_lag), divided by the exact
    circular Hann ACF (without this the decaying window ACF drags the
    peak toward smaller lags — a measured +8 cent bias on steady tones),
    and parabolic-fit.  Two fixed iterations; frame-local given f0, so
    the streaming caches stay exact.  Measured on the fixtures: sweep
    p50 22.5 -> 4.2 cents, harmonic max 3.3 -> 0.9."""
    N = cfg.fft_size
    fs = float(cfg.sample_rate)
    voiced = f0 > 0
    lag = fs / jnp.maximum(f0, 1.0)
    # sub-f0_floor bins carry no pitch evidence and poison the ACF under
    # a DC offset (see _periodicity_hp_mask)
    P = P * jnp.asarray(_periodicity_hp_mask(cfg), P.dtype)[None, :]

    def rho(l):
        return (2.0 + jnp.cos(2.0 * jnp.pi * l / N)) / 3.0

    # subharmonic (octave-up) correction first — see DspConfig
    # .octave_up_margin: equal corrected periodicity at tau/2 means the
    # CMND stage landed on a doubled period (jitter decorrelates long
    # lags); real weak-fundamental frames keep odd-harmonic energy and
    # fail the check.  Masked, fixed iterations (frame-local).
    r0 = dft.autocorr_at_lag(P, jnp.zeros_like(lag), N) + 1e-20
    for _ in range(iters):
        l0 = jnp.round(lag)
        lh = jnp.round(lag / 2.0)
        ok = (lh >= cfg.lag_min) & (l0 <= cfg.lag_max)
        p_full = dft.autocorr_at_lag(P, l0, N) / (r0 * rho(l0))
        p_half = dft.autocorr_at_lag(P, lh, N) / (r0 * rho(lh))
        halve = ok & (p_half >= p_full - cfg.octave_up_margin)
        lag = jnp.where(halve, lag / 2.0, lag)

    for _ in range(iters):
        l0 = jnp.round(lag)
        ok = (l0 >= cfg.lag_min + 1) & (l0 <= cfg.lag_max - 1)
        a = dft.autocorr_at_lag(P, l0 - 1.0, N) / rho(l0 - 1.0)
        b = dft.autocorr_at_lag(P, l0, N) / rho(l0)
        c = dft.autocorr_at_lag(P, l0 + 1.0, N) / rho(l0 + 1.0)
        den = a - 2.0 * b + c
        delta = jnp.where(jnp.abs(den) > 1e-12,
                          0.5 * (a - c) / jnp.where(den == 0, 1.0, den),
                          0.0)
        lag = jnp.where(ok, l0 + jnp.clip(delta, -1.0, 1.0), lag)
    f0_new = fs / lag
    keep = voiced & (f0_new >= cfg.f0_floor) & (f0_new <= cfg.f0_ceil)
    return jnp.where(keep, f0_new, f0)


def _cmnd_and_energy(x: jnp.ndarray, num_frames: int, cfg: DspConfig,
                     center_offset: int = 0
                     ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Shared front half of the period search: framing, anti-alias +
    decimate, CMND.  Returns (dp [F, lag_max_d+1], frame energy e0 [F]).

    Callers that need BOTH the raw estimate and the candidate lattice
    use ``f0_raw_and_candidates`` so the CMND is computed exactly once
    by construction (no CSE reliance).
    """
    hop, W = cfg.hop, cfg.f0_window_d
    lmax = cfg.lag_max_d
    frames = extract_centered_frames(x, num_frames, hop, cfg.f0_frame_len,
                                     center_offset)
    # anti-alias + decimate (Dio's low-pass + downsample): one banded MXU
    # matmul per frame; the period search then runs on the coarse grid
    if cfg.f0_decimation > 1:
        D = jnp.asarray(_decim_matrix(cfg.f0_decimation, cfg.f0_aa_half,
                                      cfg.f0_frame_len_d), frames.dtype)
        frames = jnp.matmul(frames, D, precision=jax.lax.Precision.HIGH)

    # Per-frame mean removal (frame-local, so streaming caches stay
    # exact).  d(l) = sum (x[n]-x[n+l])^2 is DC-invariant in exact
    # arithmetic, but the matmul factorization d = e0 + e - 2c is NOT in
    # float32: a DC-offset input (cheap mics sit a few percent off zero)
    # makes e and c huge while their difference stays small — measured on
    # the formant fixture at +0.1 DC, the cancellation noise swamped the
    # true dips and the tracker emitted garbage (octave-quadrupled F0).
    # Subtracting the frame mean also makes the silence gate's e0 a true
    # variance (a constant offset is not signal).
    frames = frames - jnp.mean(frames, axis=1, keepdims=True)
    d = difference_function(frames, W, lmax)
    dp = cmnd(d)                                             # [F, lmax+1]
    e0 = jnp.sum(frames[:, :W] ** 2, axis=1)
    return dp, e0


def estimate_f0_raw(x: jnp.ndarray, num_frames: int, cfg: DspConfig,
                    center_offset: int = 0) -> jnp.ndarray:
    """Pre-median per-frame F0 — frame-local, so values are independent of
    the analysis window placement.  The streaming layer caches raw values
    across chunks and applies the 3-tap median itself (the median couples
    neighboring frames, so it must see the cached neighbor)."""
    dp, e0 = _cmnd_and_energy(x, num_frames, cfg, center_offset)
    return _select_f0_from_cmnd(dp, e0, cfg)


def f0_raw_and_candidates(x: jnp.ndarray, num_frames: int, cfg: DspConfig,
                          center_offset: int = 0
                          ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(raw f0 [F], cand_f0 [F, K], emis [F, K]) from ONE CMND pass.

    The hot path's entry point: the expensive front half (framing,
    decimation, DFT cross-correlation, CMND) is shared explicitly
    between the raw selection and the candidate lattice."""
    dp, e0 = _cmnd_and_energy(x, num_frames, cfg, center_offset)
    raw = _select_f0_from_cmnd(dp, e0, cfg)
    cand, emis = _candidates_from_cmnd(dp, e0, cfg)
    return raw, cand, emis


def _select_f0_from_cmnd(dp: jnp.ndarray, e0: jnp.ndarray, cfg: DspConfig
                         ) -> jnp.ndarray:
    W = cfg.f0_window_d
    lmin, lmax = cfg.lag_min_d, cfg.lag_max_d
    fs = float(cfg.f0_fs_d)

    # search range [lmin, lmax]
    r = dp[:, lmin: lmax + 1]                                # [F, R]
    R = r.shape[1]
    nxt = jnp.concatenate(
        [dp[:, lmin + 1: lmax + 1],
         jnp.full((r.shape[0], 1), jnp.inf, r.dtype)], axis=1)
    ok = (r < cfg.cmnd_threshold) & (r <= nxt)
    first = jnp.argmax(ok, axis=1)                           # first True
    # fallback: smallest lag within fallback_dip_margin of the global
    # min (bare argmin prefers doubled periods on jittery frames; the
    # global min itself always qualifies, so argmax finds a True)
    dmin = jnp.min(r, axis=1, keepdims=True)
    near = (r <= dmin + cfg.fallback_dip_margin) & (r <= nxt)
    fallback = jnp.argmax(near, axis=1)
    tau_rel = jnp.where(ok.any(axis=1), first, fallback)
    tau = tau_rel + lmin                                     # [F] int

    # scalar-per-row selections as mask-sums (lane gathers serialize on
    # TPU; a masked reduce vectorizes)
    cols = jnp.arange(R)
    dp_tau = jnp.sum(jnp.where(cols[None, :] == tau_rel[:, None], r, 0.0),
                     axis=1)

    # octave-down verification (Dio/Harvest candidate-voting role,
    # upstream:mmorise/World src/dio.cpp): a weak fundamental under a
    # strong even-harmonic stack puts the first dip at HALF the true
    # period; if the dip near lag 2*tau is deeper by octave_margin,
    # descend.  Two fixed iterations = up to two octaves; masked
    # reductions keep it one shape per frame (frame-local, so the
    # streaming raw-F0 cache semantics are unchanged).
    cols_full = jnp.arange(dp.shape[1])
    for _ in range(2):
        m2 = ((cols_full[None, :] >= 2 * tau[:, None] - 2)
              & (cols_full[None, :] <= 2 * tau[:, None] + 2)
              & (cols_full[None, :] >= lmin)
              & (cols_full[None, :] <= lmax))
        dp2_masked = jnp.where(m2, dp, jnp.inf)
        dp_t2 = jnp.min(dp2_masked, axis=1)
        t2 = jnp.argmin(dp2_masked, axis=1)
        better = (2 * tau <= lmax) & (dp_t2 + cfg.octave_margin < dp_tau)
        tau = jnp.where(better, t2, tau)
        dp_tau = jnp.where(better, dp_t2, dp_tau)

    # parabolic refinement (only strictly inside the search range)
    tm1 = jnp.sum(jnp.where(
        cols_full[None, :] == jnp.maximum(tau - 1, 0)[:, None], dp, 0.0),
        axis=1)
    tp1 = jnp.sum(jnp.where(
        cols_full[None, :] == jnp.minimum(tau + 1, lmax)[:, None], dp, 0.0),
        axis=1)
    denom = tm1 - 2.0 * dp_tau + tp1
    delta = jnp.where(jnp.abs(denom) > 1e-12,
                      0.5 * (tm1 - tp1) / jnp.where(denom == 0, 1.0, denom),
                      0.0)
    delta = jnp.clip(delta, -1.0, 1.0)
    interior = (tau > lmin) & (tau < lmax)
    t_ref = tau.astype(dp.dtype) + jnp.where(interior, delta, 0.0)

    f0 = fs / t_ref
    voiced = ((dp_tau < cfg.voicing_threshold)
              & (e0 / W >= prim.SILENCE_POWER)
              & (f0 >= cfg.f0_floor) & (f0 <= cfg.f0_ceil))
    return jnp.where(voiced, f0, 0.0)
