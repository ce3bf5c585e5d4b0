"""Pure-NumPy golden reference for every DSP stage.

This is the framework's *own* reference trajectory (SURVEY.md §4): since the
upstream reference cannot be executed in this environment, correctness of the
JAX/Pallas implementations is defined as ``allclose`` against this
obviously-correct, loop-style float64 implementation.  Semantics mirror the
upstream stages (SURVEY.md §2b): DIO/Harvest-equivalent F0 (reformulated as
YIN/CMND so it vectorizes), CheapTrick-equivalent envelope (power spectrum +
pitch-adaptive cepstral liftering), D4C-equivalent band aperiodicity
(band-filtered lag-domain periodicity), SPTK-style mel-cepstrum (warped
cosine least squares), and WORLD-synthesis-equivalent harmonic+noise
overlap-add generation with explicit streaming carry.

Every function here is intentionally simple NumPy; no JAX.
"""

from __future__ import annotations

import numpy as np

from realtime_yukarin_tpu.config import DspConfig
from realtime_yukarin_tpu.dsp import primitives as prim


# ---------------------------------------------------------------------------
# Framing
# ---------------------------------------------------------------------------

def extract_centered_frames(x: np.ndarray, num_frames: int, hop: int,
                            frame_len: int) -> np.ndarray:
    """Frame i covers [i*hop - frame_len//2, ...), zero-padded out of range."""
    n = len(x)
    starts = np.arange(num_frames) * hop - frame_len // 2
    idx = starts[:, None] + np.arange(frame_len)[None, :]
    valid = (idx >= 0) & (idx < n)
    out = np.where(valid, np.asarray(x, np.float64)[np.clip(idx, 0, n - 1)],
                   0.0)
    return out


# ---------------------------------------------------------------------------
# F0 estimation (YIN / CMND; DIO-equivalent role)
# ---------------------------------------------------------------------------

def _median3(a: float, b: float, c: float) -> float:
    return max(min(a, b), min(max(a, b), c))


def estimate_f0(x: np.ndarray, num_frames: int, cfg: DspConfig) -> np.ndarray:
    hop = cfg.hop
    R, hw = cfg.f0_decimation, cfg.f0_aa_half
    W = cfg.f0_window_d
    lmin, lmax = cfg.lag_min_d, cfg.lag_max_d
    FL, FLd = cfg.f0_frame_len, cfg.f0_frame_len_d
    frames = extract_centered_frames(x, num_frames, hop, FL)
    fs = float(cfg.f0_fs_d)
    h = prim.f0_decim_filter(R, hw)

    f0_raw = np.zeros(num_frames)
    for i in range(num_frames):
        # anti-alias + decimate (Dio's low-pass + downsample role): the
        # period search runs on the coarse grid; parabolic refinement is
        # sub-sample there too, so precision stays within a few cents
        s = np.array([np.dot(h, frames[i, m * R: m * R + 2 * hw + 1])
                      for m in range(FLd)])
        s = s - s.mean()     # DC removal (mirrors dsp.f0._cmnd_and_energy)
        # squared difference function d(l) for l in [0, lmax]
        d = np.zeros(lmax + 1)
        for l in range(lmax + 1):
            diff = s[:W] - s[l:l + W]
            d[l] = np.dot(diff, diff)
        e0 = np.dot(s[:W], s[:W])
        if e0 / W < prim.SILENCE_POWER:
            continue
        # cumulative-mean-normalized difference
        dprime = np.ones(lmax + 1)
        csum = 0.0
        for l in range(1, lmax + 1):
            csum += d[l]
            dprime[l] = d[l] * l / csum if csum > 0 else 1.0
        # first dip below threshold (with local-min check); else the
        # smallest lag within fallback_dip_margin of the global minimum
        # (a bare argmin prefers doubled periods on jittery frames —
        # see DspConfig.fallback_dip_margin)
        tau = -1
        for l in range(lmin, lmax + 1):
            nxt = dprime[l + 1] if l + 1 <= lmax else np.inf
            if dprime[l] < cfg.cmnd_threshold and dprime[l] <= nxt:
                tau = l
                break
        if tau < 0:
            dmin = dprime[lmin:lmax + 1].min()
            for l in range(lmin, lmax + 1):
                nxt = dprime[l + 1] if l + 1 <= lmax else np.inf
                if (dprime[l] <= dmin + cfg.fallback_dip_margin
                        and dprime[l] <= nxt):
                    tau = l
                    break
        # octave-down verification (Dio/Harvest candidate-voting role): the
        # first dip of a weak-fundamental / strong-2nd-harmonic frame sits
        # at half the true period; a markedly deeper dip near 2*tau wins.
        for _ in range(2):              # fixed 2 steps = JAX impl's shape
            if 2 * tau > lmax:
                break
            lo = max(2 * tau - 2, lmin)
            hi = min(2 * tau + 2, lmax)
            t2 = lo + int(np.argmin(dprime[lo:hi + 1]))
            if dprime[t2] + cfg.octave_margin < dprime[tau]:
                tau = t2
            else:
                break
        if dprime[tau] >= cfg.voicing_threshold:
            continue
        # parabolic refinement
        t = float(tau)
        if lmin < tau < lmax:
            a, b, c = dprime[tau - 1], dprime[tau], dprime[tau + 1]
            denom = a - 2.0 * b + c
            if abs(denom) > 1e-12:
                delta = 0.5 * (a - c) / denom
                t = tau + float(np.clip(delta, -1.0, 1.0))
        f0 = fs / t
        if cfg.f0_floor <= f0 <= cfg.f0_ceil:
            f0_raw[i] = f0

    # 3-tap median smoothing (edge-replicated)
    f0 = np.zeros_like(f0_raw)
    for i in range(num_frames):
        a = f0_raw[max(i - 1, 0)]
        b = f0_raw[i]
        c = f0_raw[min(i + 1, num_frames - 1)]
        f0[i] = _median3(a, b, c)
    # octave-continuity snap (Harvest contour-selection role) then
    # full-rate refinement (StoneMask role, upstream:mmorise/World
    # src/stonemask.cpp): the decimated search is only grid-accurate and
    # its 40 ms window averages vibrato; the refinement re-reads the
    # FULL-RATE Hann-windowed autocorrelation (shorter effective window)
    # around the coarse lag and parabolic-fits the window-ACF-corrected
    # peak.  Measured: sweep p50 22.5 -> 4.2 cents, harmonic max
    # 3.3 -> 0.9 (tests/test_dsp_golden.py gates).
    cand_f0, cand_cost = f0_candidates(x, num_frames, cfg)
    f0, choice = viterbi_snap(f0, cand_f0, cand_cost, cfg)
    f0 = voicing_revision(x, f0, choice, num_frames, cfg)
    return refine_f0(x, f0, num_frames, cfg)


_BIG = 1.0e6      # finite "infinity" for the masked min-plus DP


def f0_candidates(x: np.ndarray, num_frames: int, cfg: DspConfig
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Top-K CMND dip candidates per frame (Harvest candidate-lattice
    role).  Loop-style mirror of ``dsp.f0.f0_candidates``: K deepest
    local CMND minima, parabolic-refined; emission = (cost above the
    frame's best) x periodicity reliability, with cost carrying a
    RELATIVE (multiplicative) per-octave lag penalty plus the additive
    octave_margin term (see DspConfig.f0_rel_bias).  Returns (cand_f0
    [F, K] Hz with 0 = invalid, emis [F, K])."""
    hop = cfg.hop
    R, hw = cfg.f0_decimation, cfg.f0_aa_half
    W = cfg.f0_window_d
    lmin, lmax = cfg.lag_min_d, cfg.lag_max_d
    FL, FLd = cfg.f0_frame_len, cfg.f0_frame_len_d
    K = cfg.f0_cand_k
    frames = extract_centered_frames(x, num_frames, hop, FL)
    fs = float(cfg.f0_fs_d)
    h = prim.f0_decim_filter(R, hw)

    cand_f0 = np.zeros((num_frames, K))
    cand_cost = np.full((num_frames, K), _BIG)
    for i in range(num_frames):
        s = np.array([np.dot(h, frames[i, m * R: m * R + 2 * hw + 1])
                      for m in range(FLd)])
        s = s - s.mean()     # DC removal (mirrors dsp.f0._cmnd_and_energy)
        d = np.zeros(lmax + 1)
        for l in range(lmax + 1):
            diff = s[:W] - s[l:l + W]
            d[l] = np.dot(diff, diff)
        e0 = np.dot(s[:W], s[:W])
        if e0 / W < prim.SILENCE_POWER:
            continue
        dprime = np.ones(lmax + 1)
        csum = 0.0
        for l in range(1, lmax + 1):
            csum += d[l]
            dprime[l] = d[l] * l / csum if csum > 0 else 1.0
        # local minima in [lmin, lmax] (<= both neighbors; the right
        # neighbor of lmax is +inf, matching the JAX mask)
        dips = []
        for l in range(lmin, lmax + 1):
            nxt = dprime[l + 1] if l + 1 <= lmax else np.inf
            if dprime[l] <= dprime[l - 1] and dprime[l] <= nxt:
                dips.append((dprime[l], l))
        dips.sort()                      # by depth, then smaller lag
        gamma = 1.0 + cfg.f0_rel_bias
        dip_best = _BIG
        for k, (ck, tau) in enumerate(dips[:K]):
            t = float(tau)
            if lmin < tau < lmax:
                a, b, c = dprime[tau - 1], dprime[tau], dprime[tau + 1]
                denom = a - 2.0 * b + c
                if abs(denom) > 1e-12:
                    t = tau + float(np.clip(0.5 * (a - c) / denom,
                                            -1.0, 1.0))
            f0_k = fs / t
            if cfg.f0_floor <= f0_k <= cfg.f0_ceil:
                oct_k = np.log2(tau / lmin)
                cand_f0[i, k] = f0_k
                cand_cost[i, k] = (ck * gamma ** oct_k
                                   + cfg.octave_margin * oct_k)
                dip_best = min(dip_best, ck)
        # -> reliability-weighted relative emissions
        valid = cand_cost[i] < 0.5 * _BIG
        if valid.any():
            m = cand_cost[i][valid].min()
            r = float(np.clip(1.0 - dip_best / cfg.voicing_confidence_scale,
                              0.0, 1.0))
            cand_cost[i] = np.where(
                valid, np.minimum((cand_cost[i] - m) * r, cfg.f0_emis_cap),
                _BIG)
    return cand_f0, cand_cost


def viterbi_snap(f0: np.ndarray, cand_f0: np.ndarray,
                 cand_cost: np.ndarray, cfg: DspConfig
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Bounded-window Viterbi contour selection (Harvest contour-DP
    role).  Loop-style mirror of ``dsp.f0.viterbi_snap``: each voiced
    frame is re-decided among its top-K candidates by the minimum-cost
    path through the +-halo window; transition = f0_trans_weight per
    octave between consecutive active frames, inactive frames pass
    through freely.  Per-frame windowed, so bounded lookahead.  Returns
    (snapped f0, per-frame chosen candidate incl. unvoiced frames)."""
    F = len(f0)
    Hl = cfg.f0_snap_left_eff
    Hr = cfg.f0_snap_halo
    if Hl == 0 and Hr == 0:
        ch = np.zeros(F)
        for i in range(F):
            if (cand_f0[i] > 0).any():
                ch[i] = cand_f0[i, int(np.argmin(cand_cost[i]))]
        return f0, ch
    K = cand_f0.shape[1]
    wt = cfg.f0_trans_weight
    out = f0.copy()
    emis = cand_cost                 # already emission-transformed

    def half_pass(i, offs):
        """Message into center i from window frames at i+offs (edge
        first), transition into the center included."""
        msg = np.zeros(K)
        lfp = np.zeros(K)
        has = False
        for o in offs:
            j = i + o
            if not (0 <= j < F):
                continue
            if f0[j] <= 0 or not (cand_f0[j] > 0).any():
                continue
            lfj = np.log2(np.maximum(cand_f0[j], 1e-6))
            new = np.empty(K)
            for k in range(K):
                step = (msg + wt * np.abs(lfj[k] - lfp)).min() if has \
                    else msg.min()
                new[k] = emis[j, k] + step
            msg, lfp, has = new, lfj, True
        lfc = np.log2(np.maximum(cand_f0[i], 1e-6))
        into = np.empty(K)
        for k in range(K):
            into[k] = (msg + wt * np.abs(lfc[k] - lfp)).min() if has \
                else msg.min()
        return into

    choices = np.zeros(F)
    for i in range(F):
        if not (cand_f0[i] > 0).any():
            continue
        alpha = half_pass(i, range(-Hl, 0))
        beta = half_pass(i, range(Hr, 0, -1))
        total = alpha + beta + emis[i]
        choice = cand_f0[i, int(np.argmin(total))]
        choices[i] = choice
        if f0[i] > 0 and choice > 0:
            out[i] = choice
    return out, choices


def voicing_revision(x: np.ndarray, f0: np.ndarray, choice: np.ndarray,
                     num_frames: int, cfg: DspConfig) -> np.ndarray:
    """Band-evidence voicing revision (D4C LoveTrain role).  Loop-style
    mirror of ``dsp.f0.voicing_revision``: demote voiced frames whose
    fft window contains a near-silent sub-block; rescue CMND-unvoiced
    frames whose lattice candidate shows high low-band periodicity with
    a meaningful low-band energy share."""
    N = cfg.fft_size
    fs = float(cfg.sample_rate)
    hop = cfg.hop
    M = cfg.voicing_blocks
    w = prim.hann(N)
    frames = extract_centered_frames(x, num_frames, cfg.hop, N)
    kb = np.arange(N // 2 + 1) * fs / N
    # DC + Hann-leakage bins excluded from periodicity/band evidence
    # (mirrors dsp.f0._periodicity_hp_mask)
    hp_mask = (kb >= 0.7 * cfg.f0_floor).astype(np.float64)
    w_low = (kb < cfg.voicing_low_band_hz) * hp_mask
    T = len(x)

    def block_e(b: int) -> float:
        """Energy of hop-block [b*hop, (b+1)*hop), zero outside x
        (mirrors dsp.f0.voicing_revision's hop-grid framing)."""
        lo, hi = max(b * hop, 0), min((b + 1) * hop, T)
        if lo >= hi:
            return 0.0
        seg = np.asarray(x[lo:hi], np.float64)
        # DC-corrected on the zero-padded hop-block convention (divide
        # by hop, not len(seg), to match the JAX framing's zero padding)
        return float(max(np.sum(seg * seg) - seg.sum() ** 2 / hop, 0.0))

    out = f0.copy()
    for i in range(num_frames):
        be = np.array([block_e(i + m - M // 2) for m in range(M)])
        energy_ok = (be.min() / (be.mean() + 1e-20)
                     >= cfg.voicing_block_ratio)
        if not energy_ok:
            out[i] = 0.0
            continue
        if f0[i] > 0 or choice[i] <= 0:
            continue
        P = np.abs(np.fft.rfft(frames[i] * w)) ** 2
        P[:2] = 0.0   # exact DC rejection (mirrors envelope.power_spectrogram)
        Pl = P * w_low
        low_frac = Pl.sum() / ((P * hp_mask).sum() + 1e-20)
        if low_frac < cfg.voicing_low_frac:
            continue
        lag = int(round(fs / choice[i]))
        rl = np.fft.irfft(Pl.astype(np.complex128), N)
        p_low = rl[lag] / (rl[0] + 1e-20) / hann_acf(lag, N)
        if p_low >= cfg.voicing_rescue_plow:
            out[i] = choice[i]
    return out


def refine_f0(x: np.ndarray, f0: np.ndarray, num_frames: int,
              cfg: DspConfig, iters: int = 2) -> np.ndarray:
    """Per-frame F0 refinement on the shared Hann power spectrum.

    r(l) = irfft(P)[l] is the autocorrelation of the WINDOWED frame; for
    periodic content its expected shape is periodicity(l) * hann_acf(l),
    so the parabolic fit runs on r(l)/hann_acf(l) (without the correction
    the decaying window ACF drags the peak toward smaller lags — a
    measured +8 cent bias on steady tones).  Frame-local given f0: the
    streaming layer's per-frame caches stay bit-exact."""
    N = cfg.fft_size
    fs = float(cfg.sample_rate)
    w = prim.hann(N)
    frames = extract_centered_frames(x, num_frames, cfg.hop, N)
    # sub-f0_floor bins carry no pitch evidence and poison the ACF under
    # a DC offset (mirrors dsp.f0._periodicity_hp_mask)
    kb = np.arange(N // 2 + 1) * fs / N
    hp_mask = (kb >= 0.7 * cfg.f0_floor).astype(np.float64)
    out = f0.copy()
    for i in range(num_frames):
        if f0[i] <= 0:
            continue
        P = np.abs(np.fft.rfft(frames[i] * w)) ** 2 * hp_mask
        r = np.fft.irfft(P.astype(np.complex128), N)
        lag = fs / f0[i]
        # subharmonic (octave-up) correction — see DspConfig
        # .octave_up_margin: corrected periodicity at tau/2 matching
        # tau's means the candidate period is doubled
        r0 = r[0] + 1e-20
        for _ in range(iters):
            l0 = int(round(lag))
            lh = int(round(lag / 2.0))
            if lh < cfg.lag_min or l0 > cfg.lag_max:
                break
            p_full = r[l0] / (r0 * hann_acf(l0, N))
            p_half = r[lh] / (r0 * hann_acf(lh, N))
            if p_half >= p_full - cfg.octave_up_margin:
                lag = lag / 2.0
            else:
                break
        for _ in range(iters):
            l0 = int(round(lag))
            if l0 < cfg.lag_min + 1 or l0 > cfg.lag_max - 1:
                break
            a = r[l0 - 1] / hann_acf(l0 - 1, N)
            b = r[l0] / hann_acf(l0, N)
            c = r[l0 + 1] / hann_acf(l0 + 1, N)
            den = a - 2.0 * b + c
            if abs(den) > 1e-12:
                lag = l0 + float(np.clip(0.5 * (a - c) / den, -1.0, 1.0))
        f0_new = fs / lag
        if cfg.f0_floor <= f0_new <= cfg.f0_ceil:
            out[i] = f0_new
    return out


# ---------------------------------------------------------------------------
# Spectral envelope (CheapTrick-equivalent)
# ---------------------------------------------------------------------------

def _quefrency_filter(X: np.ndarray, lift: np.ndarray) -> np.ndarray:
    """rfft(lift * irfft(X)).real — sinc lifters make this frequency-domain
    rectangular smoothing (rect <-> sinc duality); same linear map as the
    JAX ops.dft.quefrency_filter matmuls."""
    return np.fft.rfft(np.fft.irfft(X) * lift).real


def log_spectral_envelope(x: np.ndarray, f0: np.ndarray, num_frames: int,
                          cfg: DspConfig) -> np.ndarray:
    """Power spectrum -> f0-adaptive linear-domain smoothing (quefrency
    sinc = rect of full width f0, CheapTrick-style: fills inter-harmonic
    valleys so the envelope passes through harmonic peaks) -> log ->
    f0-adaptive cepstral lifter.  Returns the LOG power envelope — the
    primary analysis product (mc encodes from it directly)."""
    N = cfg.fft_size
    hop = cfg.hop
    fs = float(cfg.sample_rate)
    w = prim.hann(N)
    frames = extract_centered_frames(x, num_frames, hop, N)
    env = np.zeros((num_frames, cfg.spec_bins))
    q = np.arange(N)
    t_q = np.minimum(q, N - q) / fs      # symmetric quefrency in seconds
    for i in range(num_frames):
        P = np.abs(np.fft.rfft(frames[i] * w)) ** 2
        P[:2] = 0.0   # exact DC rejection (mirrors envelope.power_spectrogram)
        f0_eff = f0[i] if f0[i] > 0 else prim.DEFAULT_F0
        lift = np.sinc(f0_eff * t_q)     # np.sinc(x) = sin(pi x)/(pi x)
        P = _quefrency_filter(P, lift)
        floor = max(P.max() * 10.0 ** (cfg.envelope_floor_db / 10.0),
                    prim.POWER_FLOOR)
        L = np.log(np.maximum(P, floor))
        env[i] = _quefrency_filter(L, lift)
    return env


def spectral_envelope(x: np.ndarray, f0: np.ndarray, num_frames: int,
                      cfg: DspConfig) -> np.ndarray:
    return np.exp(log_spectral_envelope(x, f0, num_frames, cfg))


# ---------------------------------------------------------------------------
# Band aperiodicity (D4C-equivalent)
# ---------------------------------------------------------------------------

def hann_acf(lag, n: int):
    """Circular autocorrelation of the periodic Hann window, normalized to
    1 at lag 0: rho(l) = (2 + cos(2 pi l / n)) / 3 — exact (expand
    w = 1/2 - 1/2 cos and sum).  The expected r(lag)/r(0) of a perfectly
    periodic signal under the analysis window; dividing by it makes the
    periodicity measure window-free."""
    return (2.0 + np.cos(2.0 * np.pi * np.asarray(lag, np.float64) / n)) / 3.0


def band_aperiodicity(x: np.ndarray, f0: np.ndarray, num_frames: int,
                      cfg: DspConfig) -> np.ndarray:
    """Band periodicity from the band-masked power spectrum's
    autocorrelation at the F0 lag (Wiener-Khinchin), window-ACF-corrected.

    Uses the SAME Hann-windowed fft_size power spectrum as the envelope
    stage — on device the two stages share one |STFT|^2 (the analysis
    front-end's dominant cost, VERDICT r2 weak #1) — so no second framing
    or DFT exists anywhere.  The Hann window also measures periodicity
    more cleanly than the old rectangular f0_frame_len slice on modulated
    signals (less spectral leakage across band edges)."""
    hop = cfg.hop
    N = cfg.fft_size
    B = cfg.num_ap_bands
    fs = float(cfg.sample_rate)
    w = prim.hann(N)
    masks = prim.ap_band_masks(cfg.sample_rate, B, N)
    frames = extract_centered_frames(x, num_frames, hop, N)
    ap = np.ones((num_frames, B))
    for i in range(num_frames):
        if f0[i] <= 0:
            continue
        lag = int(np.clip(round(fs / f0[i]), cfg.lag_min, cfg.lag_max))
        P = np.abs(np.fft.rfft(frames[i] * w)) ** 2
        P[:2] = 0.0   # exact DC rejection (mirrors envelope.power_spectrogram)
        rho = hann_acf(lag, N)
        for b in range(B):
            r = np.fft.irfft((P * masks[b]).astype(np.complex128), N)
            p = r[lag] / (r[0] + 1e-20) / rho
            ap[i, b] = np.sqrt(np.clip(1.0 - p, 1e-6, 1.0))
    return ap


# ---------------------------------------------------------------------------
# Mel-cepstrum (SPTK-style role, warped-cosine least squares)
# ---------------------------------------------------------------------------

def encode_mcep(env: np.ndarray, cfg: DspConfig) -> np.ndarray:
    _, A = prim.mcep_basis(cfg.spec_bins, cfg.mcep_order, cfg.mcep_alpha)
    return np.log(np.maximum(env, prim.POWER_FLOOR)) @ A.T


def encode_mcep_from_log(L: np.ndarray, cfg: DspConfig) -> np.ndarray:
    """Mel-cepstrum straight from the LOG envelope — the analysis path.

    No extra floor: ``log_spectral_envelope`` already floors the log
    spectrum before liftering, and the log-domain lifter is frequency-
    domain smoothing with an (almost entirely) positive rect kernel, so
    the envelope cannot meaningfully undershoot that floor."""
    _, A = prim.mcep_basis(cfg.spec_bins, cfg.mcep_order, cfg.mcep_alpha)
    return L @ A.T


def decode_mcep(mc: np.ndarray, cfg: DspConfig) -> np.ndarray:
    Bm, _ = prim.mcep_basis(cfg.spec_bins, cfg.mcep_order, cfg.mcep_alpha)
    return np.exp(mc @ Bm.T)


# ---------------------------------------------------------------------------
# F0 statistics transform (yukarin F0Statistics equivalent)
# ---------------------------------------------------------------------------

def f0_statistics(f0: np.ndarray) -> tuple[float, float]:
    voiced = f0[f0 > 0]
    logs = np.log(voiced)
    return float(logs.mean()), float(logs.std())


def convert_f0(f0: np.ndarray, mean_in: float, std_in: float,
               mean_out: float, std_out: float) -> np.ndarray:
    out = np.zeros_like(f0)
    v = f0 > 0
    out[v] = np.exp((np.log(f0[v]) - mean_in) / max(std_in, 1e-6) * std_out
                    + mean_out)
    return out


# ---------------------------------------------------------------------------
# Synthesis (harmonic + noise with explicit carry; WORLD-synthesis role)
# ---------------------------------------------------------------------------

def synthesize(f0: np.ndarray, env: np.ndarray, ap: np.ndarray,
               noise: np.ndarray, cfg: DspConfig,
               phase0: float = 0.0,
               voiced_prev: bool = False,
               noise_tail: np.ndarray | None = None):
    """Generate ``F*hop`` samples from F+1 frames of controls.

    Args:
      f0:    [F+1] Hz, 0 = unvoiced.  Controls for sample n in
             [i*hop, (i+1)*hop) interpolate between frames i and i+1.
      env:   [F+1, spec_bins] power spectral envelope.
      ap:    [F+1, num_ap_bands] band aperiodicity in [0, 1].
      noise: [F, noise_bins, 2] gaussian drivers (re, im), unit variance per
             component (so each complex driver has E|g|^2 = 2; the amplitude
             convention below accounts for it).
      phase0: fundamental phase carried in from the previous chunk.
      voiced_prev: whether the frame before frame 0 was voiced.
      noise_tail: [noise_fft - hop] OLA tail carried in (zeros if None).

    Phase determinism: the fundamental phase resets to 0 at every
    unvoiced->voiced onset, so the phase track is a pure function of the F0
    contour — this is what makes chunked-streaming output exactly equal to
    offline output regardless of where the stream started.

    Returns:
      (wave [F*hop], phase_out, voiced_prev_out, noise_tail_out)
    """
    F = len(f0) - 1
    hop = cfg.hop
    fs = float(cfg.sample_rate)
    N = cfg.fft_size
    K = cfg.spec_bins
    H = cfg.num_harmonics
    n_noise = prim.noise_fft_size(hop)
    k_noise = n_noise // 2 + 1
    assert env.shape == (F + 1, K) and ap.shape[0] == F + 1
    assert noise.shape == (F, k_noise, 2)

    wsumsq = prim.analysis_window_sumsq(N)
    noise_interp_b = prim.noise_band_interp_matrix(
        N, hop, cfg.sample_rate, cfg.num_ap_bands)    # [k_noise, B]
    w_noise = prim.noise_window(hop)
    ola_norm = prim.noise_ola_norm(hop)

    centers = prim.ap_band_centers(cfg.sample_rate, cfg.num_ap_bands)
    voiced = (f0 > 0).astype(np.float64)
    f0_filled = np.where(f0 > 0, f0, prim.DEFAULT_F0)

    # per-frame harmonic amplitudes [F+1, H].  Aperiodicity at a harmonic
    # interpolates the band polyline directly (np.interp clamps at the end
    # centers, matching ap_expand_matrix's constant extrapolation).
    h_idx = np.arange(1, H + 1)
    amps = np.zeros((F + 1, H))
    for i in range(F + 1):
        freqs = h_idx * f0_filled[i]
        pos = np.clip(freqs * N / fs, 0.0, K - 1.0)
        lo = np.floor(pos).astype(int)
        hi = np.minimum(lo + 1, K - 1)
        t = pos - lo
        e_h = env[i, lo] * (1 - t) + env[i, hi] * t
        ap_h = np.interp(pos * fs / N, centers, ap[i])
        alias_ok = (freqs < prim.HARMONIC_NYQUIST_FRACTION * fs / 2.0)
        # envelope at a harmonic is its mainlobe power averaged over the
        # width-f0 smoothing window => amplitude a^2 = 4 E f0 / (fs W2)
        amps[i] = np.sqrt(4.0 * np.maximum(e_h, 0.0)
                          * f0_filled[i] / (fs * wsumsq)) \
            * np.sqrt(np.clip(1.0 - ap_h ** 2, 0.0, 1.0)) \
            * voiced[i] * alias_ok

    # ---- harmonic branch: per-sample lerped controls, accumulated phase
    # (reset to 0 whenever frame i is unvoiced or a voiced onset)
    T = F * hop
    harm = np.zeros(T)
    phase = phase0
    vprev = bool(voiced_prev)
    for i in range(F):
        boundary = phase if (f0[i] > 0 and vprev) else 0.0
        frac = (np.arange(hop) + 1.0) / hop       # (0, 1] within the hop
        f_inst = f0_filled[i] * (1 - frac) + f0_filled[i + 1] * frac
        a_inst = amps[i][None, :] * (1 - frac)[:, None] \
            + amps[i + 1][None, :] * frac[:, None]          # [hop, H]
        dphi = 2.0 * np.pi * f_inst / fs
        phi = boundary + np.cumsum(dphi)                     # [hop]
        harm[i * hop:(i + 1) * hop] = np.sum(
            a_inst * np.sin(np.outer(phi, h_idx)), axis=1)
        phase = phi[-1] % (2.0 * np.pi)
        vprev = f0[i] > 0

    # ---- noise branch: per-frame shaped gaussian spectra, windowed OLA
    acc = np.zeros(T + n_noise - hop)
    if noise_tail is not None:
        acc[:n_noise - hop] += noise_tail
    for i in range(F):
        e_noise = prim.noise_spec_interp_matrix(N, hop) @ env[i]  # [k_noise]
        ap_noise = noise_interp_b @ ap[i]
        # target per-sample variance E*ap^2/wsumsq; irfft of A*g with
        # g = (re + j*im)/sqrt(2) unit complex gives Var ~= A^2/n_noise.
        A = np.sqrt(np.maximum(e_noise * ap_noise ** 2, 0.0)
                    * n_noise / wsumsq)
        g = (noise[i, :, 0] + 1j * noise[i, :, 1]) / np.sqrt(2.0)
        spec = A * g
        spec[0] = spec[0].real * np.sqrt(2.0)
        spec[-1] = spec[-1].real * np.sqrt(2.0)
        seg = np.fft.irfft(spec) * w_noise
        acc[i * hop: i * hop + n_noise] += seg
    norm = np.tile(ola_norm, T // hop + n_noise // hop)[:len(acc)]
    noise_out = acc[:T] / norm[:T]
    tail_out = acc[T:]

    return harm + noise_out, phase % (2.0 * np.pi), vprev, tail_out


# ---------------------------------------------------------------------------
# Full analysis convenience (offline golden encode)
# ---------------------------------------------------------------------------

def analyze(x: np.ndarray, cfg: DspConfig):
    num_frames = len(x) // cfg.hop
    f0 = estimate_f0(x, num_frames, cfg)
    L = log_spectral_envelope(x, f0, num_frames, cfg)
    ap = band_aperiodicity(x, f0, num_frames, cfg)
    mc = encode_mcep_from_log(L, cfg)
    return dict(f0=f0, env=np.exp(L), ap=ap, mc=mc)


# ---------------------------------------------------------------------------
# Rational resampling (golden): direct windowed-sinc evaluation
# ---------------------------------------------------------------------------

def resample(x: np.ndarray, rate_in: int, rate_out: int, delay_out: int,
             half_width: int, beta: float, rolloff: float) -> np.ndarray:
    """Obviously-correct direct form of the streaming resampler: for each
    output n, evaluate the Kaiser-windowed sinc at input position
    (n - delay_out)·M/L with zero history before t=0.  O(T·HW) loops —
    test-only."""
    import math
    g = math.gcd(rate_in, rate_out)
    L, M = rate_out // g, rate_in // g
    cutoff = rolloff * min(1.0, L / M)
    T_out = len(x) * L // M
    y = np.zeros(T_out, np.float64)
    for n in range(T_out):
        p = (n - delay_out) * M / L
        k_lo = int(np.ceil(p - half_width))
        k_hi = int(np.floor(p + half_width))
        for k in range(max(k_lo, 0), min(k_hi, len(x) - 1) + 1):
            t = p - k
            w = (np.i0(beta * np.sqrt(max(0.0, 1 - (t / half_width) ** 2)))
                 / np.i0(beta))
            y[n] += x[k] * cutoff * np.sinc(cutoff * t) * w
    return y.astype(np.float32)
