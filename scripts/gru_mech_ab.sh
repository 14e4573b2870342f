#!/bin/bash
# GRU stability: mechanism-level arms (design.md §16.8, round 4).
#
# Fourth and fifth same-seed arms on the worst-spiker phase (Uni, 20
# epochs, lr 5e-4, same EZ donor, clip 5.0 — bit-comparable to
# results/gruClipAB_c5, gruGuardAB, gruGateAB). The three designed
# stabilizers (tight clip, reactive cooldown, onset lr cap) are all
# refuted (RESULTS.md "GRU stabilizer A/Bs (r4)"); these two target the
# mechanism itself:
#
# 1. update_clip 1.0 — bounds each element of Adam's post-core update
#    m̂/(√v̂+ε) at 1.0, the quantity the censuses show explodes when a
#    stale second moment meets a hard batch (a global-norm clip provably
#    cannot bound it). Prediction if the mechanism analysis is right:
#    ignitions are damped at the source (fewer/shallower spikes) with
#    unchanged converged-regime updates (|m̂/√v̂| ≲ 1 there already).
#
# 2. ema_decay 0.999 — does NOT touch the training dynamics (the raw
#    trajectory is bit-identical to the unguarded control, which doubles
#    as a determinism check: the census must reproduce control's 38
#    spikes). Instead the published weights are a ~1000-step Polyak
#    average, so eval/keep-best no longer depend on where in the
#    spike-recover cycle an epoch boundary lands. Prediction: test EM
#    >= the control's 61.0 with a smoother val trajectory.
set -e
cd "$(dirname "$0")/.."

python scripts/train_im2latex_syn.py --cell-type gru --dropout 1.0 \
    --n-epochs 20 --max-length 110 --data-dir data/im2latexUni \
    --warm-start results/im2latexEZ_gru --clip 5.0 --update-clip 1.0 \
    --out results/gruUpdClipAB/

python scripts/train_im2latex_syn.py --cell-type gru --dropout 1.0 \
    --n-epochs 20 --max-length 110 --data-dir data/im2latexUni \
    --warm-start results/im2latexEZ_gru --clip 5.0 --ema-decay 0.999 \
    --out results/gruEmaAB/

python - <<'PYEOF'
import json

def census(path):
    losses = [json.loads(l)["loss"] for l in open(path) if '"loss"' in l]
    converged = False
    n, in_spike, degraded = 0, False, 0
    for x in losses:
        if not converged:
            converged = x < 1.0
            continue
        if x > 1.0:
            degraded += 1  # sampled rows spent off the converged floor
        if x > 3.0 and not in_spike:
            n += 1
            in_spike = True
        elif x < 1.0:
            in_spike = False
    return {"spikes_gt3": n, "degraded_samples_gt1": degraded,
            "min_loss": round(min(losses), 4),
            "final_loss": round(losses[-1], 4), "n_samples": len(losses)}

for tag, label in (("results/gruClipAB_c5", "control (clip 5.0)"),
                   ("results/gruGuardAB", "spike_guard (cooldown)"),
                   ("results/gruGateAB", "converge_cap 2e-4"),
                   ("results/gruUpdClipAB", "update_clip 1.0"),
                   ("results/gruEmaAB", "ema_decay 0.999")):
    print(json.dumps({"arm": label, **census(tag + "/metrics.jsonl")}))
PYEOF
echo "GRU MECH AB DONE"
