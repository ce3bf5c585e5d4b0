"""Full-chain product gate (VERDICT r4 missing #2 / next-round #1).

Every stage is gated in isolation elsewhere; these tests convert a
held-out WAVEFORM through the complete *streamed, trained* pipeline —
analysis -> stage 1 -> F0 transform -> SR -> vocoder (all three modes) —
and gate the OUTPUT AUDIO against the target speaker's aligned features.
This is the role of ``upstream:check.py`` + human listening (SURVEY.md
§3.2, §4), made quantitative: an inter-stage interface regression (wrong
slice, swapped field, vocoder conditioned on garbage) moves these numbers
even when every per-stage gate stays green.

The trained tree comes from the session fixture shared with
test_training.py (conftest ``trained_formant``: 600 steps on the formant
corpus — measured numbers in the assertions' comments come from that
exact recipe).
"""

from __future__ import annotations

import numpy as np
import pytest

from realtime_yukarin_tpu.training import full_chain as FC
from realtime_yukarin_tpu.utils.audio_io import read_wav

MODES = ("dsp", "ddsp", "wave")


@pytest.fixture(scope="module")
def chain_metrics(trained_formant):
    cfg = trained_formant["cfg"]
    src_wave, _ = read_wav(str(trained_formant["dirs"]["ev_src"] / "ho.wav"),
                           target_rate=cfg.dsp.sample_rate)
    m_init = FC.full_chain_metrics(trained_formant["init_params"], cfg,
                                   src_wave, trained_formant["ho"], MODES)
    m_tr = FC.full_chain_metrics(trained_formant["trained_params"], cfg,
                                 src_wave, trained_formant["ho"], MODES)
    print("\n[full-chain] init:   ", {k: round(v["mcd_db"], 3)
                                      for k, v in m_init.items()})
    print("[full-chain] trained:", {k: round(v["mcd_db"], 3)
                                    for k, v in m_tr.items()})
    return m_init, m_tr


@pytest.mark.parametrize("mode", MODES)
def test_full_chain_trained_beats_identity(chain_metrics, mode):
    """The trained pipeline must beat the identity-init baseline on the
    full-product metrics, per vocoder mode.  Measured (600-step recipe):
    MCD 5.85->4.81 (dsp), 5.88->4.74 (ddsp), 5.88->4.83 (wave); log-F0
    RMSE 0.38->0.12/0.12/0.04; V/UV error <= 0.024 everywhere.  Gates
    leave ~0.4 dB / wide margins for platform jitter."""
    m_init, m_tr = chain_metrics
    i, t = m_init[mode], m_tr[mode]
    assert t["mcd_db"] < i["mcd_db"] - 0.6, (
        f"{mode}: full-chain MCD did not improve: "
        f"init {i['mcd_db']:.2f} dB -> trained {t['mcd_db']:.2f} dB")
    assert t["logf0_rmse"] < i["logf0_rmse"] - 0.1, (
        f"{mode}: full-chain log-F0 RMSE did not improve: "
        f"{i['logf0_rmse']:.3f} -> {t['logf0_rmse']:.3f}")
    assert t["logf0_rmse"] < 0.25, (
        f"{mode}: converted register off target: {t['logf0_rmse']:.3f}")
    assert t["vuv_error"] < 0.06, (
        f"{mode}: V/UV error through the chain: {t['vuv_error']:.3f}")


def test_conditioning_gap_measured_and_finetune_closes_it(trained_formant):
    """VERDICT r4 weak #4 / next-round #8: the neural vocoders train on
    ground-truth target features but consume stage-1/SR OUTPUTS at
    inference.  Measure that mismatch on the held-out pair (same real
    waveform, ground-truth vs converted-warped conditioning, real target
    F0 in both so only the FEATURE mismatch is measured), then verify the
    fine-tune-on-converted pass (``cli.train --finetune_converted``)
    strictly shrinks it without degrading the ground-truth case.

    Measured (600-step recipe, 200 fine-tune steps): ratio 1.090 (ddsp) /
    1.074 (wave); after fine-tune converted loss 1.291->1.276 and
    1.275->1.261 with gt moving < 0.6%."""
    cfg = trained_formant["cfg"]
    trained = trained_formant["trained_params"]
    ho = trained_formant["ho"]

    gap = FC.conditioning_gap(trained, cfg, ho)
    print("\n[conditioning]", {m: round(g["ratio"], 4)
                               for m, g in gap.items()})
    for mode, g in gap.items():
        # sanity: converted conditioning costs something but is not broken
        assert 0.95 < g["ratio"] < 1.5, (mode, g)

    pairs = FC.converted_pairs(trained, cfg,
                               trained_formant["dirs"]["prep_tr"])
    ft = FC.finetune_vocoder_on_converted(trained, cfg, pairs, steps=200)
    gap_ft = FC.conditioning_gap(ft, cfg, ho)
    print("[conditioning ft]", {m: round(g["ratio"], 4)
                                for m, g in gap_ft.items()})
    for mode in gap:
        assert gap_ft[mode]["converted"] < gap[mode]["converted"] - 0.004, (
            f"{mode}: fine-tune did not close the conditioning gap: "
            f"{gap[mode]['converted']:.4f} -> "
            f"{gap_ft[mode]['converted']:.4f}")
        assert gap_ft[mode]["gt"] < gap[mode]["gt"] * 1.05, (
            f"{mode}: fine-tune forgot the ground-truth case: "
            f"{gap[mode]['gt']:.4f} -> {gap_ft[mode]['gt']:.4f}")
    # the conversion stages must be untouched (only vocoder subtrees train)
    import jax
    for k in ("stage1", "stage2", "f0_stats"):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)), trained[k], ft[k])


def test_full_chain_absolute_quality(chain_metrics):
    """Absolute backstop so a regression in BOTH trees can't slip through
    the relative gates: the trained chain must stay well under the
    identity baseline's ~5.9 dB in every mode (measured 4.74-4.83)."""
    _, m_tr = chain_metrics
    for mode in MODES:
        assert m_tr[mode]["mcd_db"] < 5.4, (
            f"{mode}: absolute full-chain MCD {m_tr[mode]['mcd_db']:.2f}")
