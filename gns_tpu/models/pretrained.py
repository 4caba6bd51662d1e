"""Shipped pretrained checkpoints.

The reference README tells users to load `best_model_*.pth` checkpoints but
ships none (reference: GNS/main.py:308-309, README.md:15 — `../models/` is
referenced yet absent from the repo). We fix that gap: every supported
MATPOWER case (9/14/30/118/300) ships a pretrained checkpoint at the
reference's best config (K=4, latent 20, hidden 10, multiple_phi,
README.md:16) as a package asset in the reference's own `.pth` state_dict
layout, so they are loadable by BOTH frameworks.

Provenance: trained on one TPU v5e chip with reference-parity physics on
1024 seeded augmented grids each (tools/train_pretrained.py; case14 via
`python -m gns_tpu.train`, 1000 grids, 600 epochs). Held-out physics
residuals (fresh augmentation seed):

  case9 0.0070 | case14 0.0367 | case30 0.0117 | case118 0.0572 |
  case300 0.0343   (each trained in minutes; case30 authentic since
  round 2, case118 authentic since round 3 — its residual scale reflects
  the real network's stiff branches, and earlier synthetic-era numbers
  in git history are not comparable. ACCURACY.md's 101-epoch parity run
  for context: gns_tpu 0.053, reference 0.062)

Variant checkpoints (tools/train_pretrained_extras.py):
  "300-deep" (K=8, latent 40): held-out residual 0.0068 — 5x better than
  the K=4 case300 model, trained in ~7 min.
  "multi" (one model, all five cases, train_multi round-robin): held-out
  residuals c9 0.121 / c14 0.101 / c30 0.062 / c118 0.103 / c300 0.096
  — a single parameter set across every case, including the authentic
  case118 whose stiff-branch residual scale dominates the shared
  objective (the round-2 synthetic-118 numbers were ~2x lower for the
  small cases; the shared weights now also carry the real grid).

Paper-physics checkpoints ("{c}-paper", tools/train_pretrained.py
--physics paper; textbook residual + the quirk-Q8 fix qg_gen_only): v MSE
vs the Newton-Raphson oracle on 64 NR-feasible held-out grids —
  c9 0.00046 | c14 0.00096* | c30 0.0091* | c118 0.00039* | c300 0.00078
  (c300 at augmentation scale=0.5; see utils/augment.py).
  *case14 trains on the oracle-consistent recipe (setpoint_slack +
  true_shunts + v_anchor — its real 19 MVAr bus-9 shunt is modeled;
  1.23x better than the paper-shunt recipe).
  *case30 (authentic IEEE): the structurally hardest unsupervised
  problem shipped (true shunts + multiple power-flow branches at
  reference-strength augmentation; ACCURACY.md). Round 3 closed the
  round-2 gap (0.0552 -> 0.0091, 6.1x): warm-start the oracle-consistent
  recipe from the multi-paper generalist and fine-tune GENTLY (lr 1e-4 —
  at the default 1e-3 the fine-tune leaves the generalist's
  drift-regularized basin and lands at 0.026; curriculum over
  augmentation scale measured 0.031; tools/exp_c30_specialist.py).
  *case118 (authentic IEEE, round 3): stiff 345 kV branches scale the
  residual ~1e4x case14's — trains ONLY with grad_clip=1.0 + warmup
  (unclipped Adam stalls at a ~5e4 plateau, v MSE 0.042-0.046); with
  them, the oracle-consistent recipe reaches 0.00039.
  "300-deep-paper" (K=8, latent 40, same recipe): v MSE 0.00039.
  "multi-paper" (ONE weight set, all five cases, qg_gen_only +
  grad_clip): v MSE c9 0.00125 / c14 0.00353 / c30 0.00916 /
  c118 0.00060 / c300 0.00089. Cross-case training regularizes against
  the low-voltage-branch drift that traps the single-case objective —
  the round-3 30-paper specialist only matched it by warm-starting FROM
  it (see above).

Supervised fine-tuned checkpoints (loss = NR-label supervision + 0.1 *
physics on NR-feasible grids): per-case "{c}-sup"
(tools/train_supervised.py --warm-start {c}-paper --export) —
  c9 0.00040 | c14 0.00055 | c30 0.00606 | c118 0.00032 | c300 0.00063
  — and the round-3 accuracy flagship "multi-sup" (ONE weight set,
  tools/train_pretrained_extras.py --which multi-sup, warm-started from
  multi-paper): v MSE c9 0.00094 / c14 0.00302 / c30 0.00843 /
  c118 0.00037 / c300 0.00071, better than multi-paper on every case.
  (case300 at augmentation scale=0.5 like its paper sibling;
  case14/30/118 with true-shunt inputs; only case300's base table
  remains a labeled synthetic stand-in, see utils/cases.py.)
"""

from __future__ import annotations

import os

from gns_tpu.utils.config import GNSConfig

_ASSET_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "utils", "case_assets")

# key -> (filename, config it was trained at). All five MATPOWER cases
# ship a checkpoint at the reference's best hyperparameters, each trained
# on 1024 seeded augmented grids (tools/train_pretrained.py). Extra
# variants (tools/train_pretrained_extras.py):
#   "300-deep" — the BASELINE config #4 preset (K=8, latent 40), case300.
#   "multi"    — ONE model trained round-robin over all five cases
#                (train_multi; per-case buckets + shared topologies).
_BEST = dict(K=4, latent_dim=20, hidden_dim=10, multiple_phi=True)
_PRETRAINED = {
    c: (f"pretrained_c{c}_K4_L20_H10.pth", dict(case_nr=c, **_BEST))
    for c in (9, 14, 30, 118, 300)
}
_PRETRAINED["300-deep"] = (
    "pretrained_c300_K8_L40_H10.pth",
    dict(case_nr=300, K=8, latent_dim=40, hidden_dim=10, multiple_phi=True),
)
_PRETRAINED["300-deep-paper"] = (
    "pretrained_c300_K8_L40_H10_paper.pth",
    dict(case_nr=300, K=8, latent_dim=40, hidden_dim=10, multiple_phi=True,
         reference_parity=False, qg_gen_only=True),
)
# "118-deep-paper" (round 4) — the deep preset on the authentic case118,
# made trainable by init_correction_scale=0.1 (at K=8 the torch-default
# init's forward is NaN on the stiff 345 kV branches before any training;
# see utils/config.py). v MSE vs NR 0.000144 on the standard held-out
# set (0.000167 on the floor experiment's outaged set) — 2.2x better
# than 118-sup (0.00032), the most accurate case118 model shipped.
# The matched-capacity AWARE arm measured 0.000217
# (severe quartile 0.000296 vs 0.000276): case118's outage severity (p90
# 6.7e-5 p.u.^2) sits below even the HALVED error floor, so the round-3
# outage-awareness negative survives doubled capacity — the severity-vs-
# floor boundary is a property of the network, not of model capacity.
_PRETRAINED["118-deep-paper"] = (
    "pretrained_c118_K8_L40_H10_paper.pth",
    dict(case_nr=118, K=8, latent_dim=40, hidden_dim=10, multiple_phi=True,
         reference_parity=False, qg_gen_only=True,
         dispatch="setpoint_slack", true_shunts=True, v_anchor=0.1,
         grad_clip=1.0, warmup_steps=300, init_correction_scale=0.1),
)
# "14-deep-paper" (round 4) — the same deep recipe on case14: v MSE vs NR
# 5.9e-5, 9.3x better than 14-sup (0.00055), the most accurate case14
# model shipped. (The case30 attempt landed 0.0067 — no branch drift
# even cold-start, better than every cold K4 recipe, but the shipped
# 30-sup at 0.0061 still wins, so it was not exported.)
_PRETRAINED["14-deep-paper"] = (
    "pretrained_c14_K8_L40_H10_paper.pth",
    dict(case_nr=14, K=8, latent_dim=40, hidden_dim=10, multiple_phi=True,
         reference_parity=False, qg_gen_only=True,
         dispatch="setpoint_slack", true_shunts=True, v_anchor=0.1,
         init_correction_scale=0.1),
)
# "multi-deep-paper" (round 4) — the deep generalist (K=8/L40, one model
# round-robin over all five cases, init_correction_scale=0.1 +
# grad_clip/warmup for the stiff 118 in the mix). v MSE vs NR:
# c9 9.5e-5 / c14 0.000997 / c30 0.00745 / c118 8.3e-5 / c300* 0.000331
# — beats multi-sup on 9/118/300 (4.2x / 3.9x / 1.9x), loses on 14/30
# (the K4 warm-started fine-tunes keep those). Its c118 number even
# beats the 118-deep-paper SPECIALIST (8.3e-5 vs 1.44e-4): cross-case
# training regularizes the deep model exactly as it did the K4 family
# (ROADMAP #7).
_PRETRAINED["multi-deep-paper"] = (
    "pretrained_multi_K8_L40_H10_paper.pth",
    dict(case_nr=0, K=8, latent_dim=40, hidden_dim=10, multiple_phi=True,
         reference_parity=False, qg_gen_only=True,
         dispatch="setpoint_slack", true_shunts=True, v_anchor=0.1,
         grad_clip=1.0, warmup_steps=300, init_correction_scale=0.1),
)
# "30-deep-paper" (round 4b) — the case30 deep specialist by the recipe
# that fixed the K4 one (ROADMAP #7): gentle lr-1e-4 fine-tune of
# multi-deep-paper on the case30 paper objective (tools/exp_30_deep.py).
# v MSE vs NR 0.00496 — past 30-sup (0.00606), the first case30 model
# to beat the K4 supervised fine-tune. (Cold-start deep: 0.0067.)
_PRETRAINED["30-deep-paper"] = (
    "pretrained_c30_K8_L40_H10_paper.pth",
    dict(case_nr=30, K=8, latent_dim=40, hidden_dim=10, multiple_phi=True,
         reference_parity=False, qg_gen_only=True,
         dispatch="setpoint_slack", true_shunts=True, v_anchor=0.1,
         init_correction_scale=0.1),
)
# "{c}-deep-sup" (round 4b) — Newton-Raphson-label fine-tunes of the
# deep-paper checkpoints (tools/train_supervised.py --K 8 --latent 40
# --warm-start {c}-deep-paper --true-shunts [--grad-clip 1.0]): the
# most accurate models shipped, full stop. v MSE vs the NR oracle on
# the standard 64-feasible-grid held-out sets:
#   14-deep-sup  1.4e-5  (4.2x better than 14-deep-paper's 5.9e-5,
#                         39x better than the K4 14-sup)
#   118-deep-sup 6.3e-5  (2.3x better than 118-deep-paper's 1.44e-4;
#                         beats the deep generalist's 8.3e-5 — the
#                         label signal overcomes the cross-case
#                         regularization advantage)
_PRETRAINED["14-deep-sup"] = (
    "pretrained_c14_K8_L40_H10_sup.pth",
    dict(case_nr=14, K=8, latent_dim=40, hidden_dim=10, multiple_phi=True,
         reference_parity=False, qg_gen_only=True, true_shunts=True),
)
_PRETRAINED["118-deep-sup"] = (
    "pretrained_c118_K8_L40_H10_sup.pth",
    dict(case_nr=118, K=8, latent_dim=40, hidden_dim=10,
         multiple_phi=True, reference_parity=False, qg_gen_only=True,
         true_shunts=True),
)
# "30-deep-sup" — the same chain one level further: NR-label fine-tune
# of 30-deep-paper. v MSE vs NR 0.00184 — 3.3x better than the K4
# 30-sup (0.00606) on the hardest shipped unsupervised case.
_PRETRAINED["30-deep-sup"] = (
    "pretrained_c30_K8_L40_H10_sup.pth",
    dict(case_nr=30, K=8, latent_dim=40, hidden_dim=10,
         multiple_phi=True, reference_parity=False, qg_gen_only=True,
         true_shunts=True),
)
# "9-deep-sup" — NR-label fine-tune warm-started from the deep
# GENERALIST (no 9-deep-paper specialist exists; multi-deep-paper's c9
# 9.5e-5 is the best starting point). v MSE vs NR 5e-6 — 80x better
# than the K4 9-sup (0.00040), the most accurate checkpoint shipped.
_PRETRAINED["9-deep-sup"] = (
    "pretrained_c9_K8_L40_H10_sup.pth",
    dict(case_nr=9, K=8, latent_dim=40, hidden_dim=10,
         multiple_phi=True, reference_parity=False, qg_gen_only=True,
         true_shunts=True),
)
# "300-deep-sup" — NR-label fine-tune of 300-deep-paper (augmentation
# scale 0.5, stand-in table: starred like every c300 accuracy number).
# v MSE vs NR 0.000242* — 2.6x better than the K4 300-sup (0.00063*).
_PRETRAINED["300-deep-sup"] = (
    "pretrained_c300_K8_L40_H10_sup.pth",
    dict(case_nr=300, K=8, latent_dim=40, hidden_dim=10,
         multiple_phi=True, reference_parity=False, qg_gen_only=True),
)
# "multi-deep-sup" (round 4b) — NR-label fine-tune of multi-deep-paper
# (tools/train_pretrained_extras.py --which multi-deep-sup). v MSE vs
# NR: c9 0.000169 / c14 0.00111 / c30 0.00645 / c118 7.8e-5 / c300*
# 0.000338 — beats the K4 multi-sup on 9/30/118/300 and is the best
# GENERALIST on 30/118/300; multi-deep-paper keeps 9/14 (the label
# fine-tune trades a little of the unsupervised generalist's floor on
# the small cases for real gains where labels carry signal — the
# honest, measured split).
_PRETRAINED["multi-deep-sup"] = (
    "pretrained_multi_K8_L40_H10_sup.pth",
    dict(case_nr=0, K=8, latent_dim=40, hidden_dim=10, multiple_phi=True,
         reference_parity=False, qg_gen_only=True,
         dispatch="setpoint_slack", true_shunts=True, v_anchor=0.1,
         grad_clip=1.0, warmup_steps=300, init_correction_scale=0.1),
)
_PRETRAINED["multi"] = (
    "pretrained_multi_K4_L20_H10.pth",
    dict(case_nr=0, **_BEST),
)
_PRETRAINED["multi-paper"] = (
    "pretrained_multi_K4_L20_H10_paper.pth",
    dict(case_nr=0, reference_parity=False, qg_gen_only=True, **_BEST),
)
# "multi-sup" — the multi-paper generalist fine-tuned on Newton-Raphson
# labels across all five cases (tools/train_pretrained_extras.py
# --which multi-sup; gns_tpu/train/supervised.py train_supervised_multi).
# The accuracy flagship: cross-case training regularizes against the
# branch drift that limits single-case unsupervised models (ROADMAP #7),
# and the NR-label fine-tune lifted every specialist.
_PRETRAINED["multi-sup"] = (
    "pretrained_multi_K4_L20_H10_sup.pth",
    dict(case_nr=0, reference_parity=False, qg_gen_only=True, **_BEST),
)
# "{c}-paper" — trained on the textbook AC residual instead of the
# reference's quirky one (reference_parity=False) WITH the quirk-Q8 fix
# (qg_gen_only=True: reactive generation only at generator buses, so the
# loss carries a live load-bus reactive residual; SURVEY.md §2.4 Q8).
# Without that fix the loss has NO reactive signal and large-case
# training converges to wrong-voltage branches (case30 v MSE vs NR ~60);
# with it the paper checkpoints beat the parity ones against the
# Newton-Raphson oracle by an order of magnitude (tools/exp_spurious.py,
# 1024 grids / 400 epochs / 64 NR-feasible held-out grids: case30 v MSE
# 0.0030, case118 0.0011 vs parity 0.0170). case300 trains/evaluates at
# augmentation scale=0.5 — the reference's full perturbation strength
# leaves case300 outside the AC-solvable region (utils/augment.py).
for c in (9, 14, 30, 118, 300):
    _PRETRAINED[f"{c}-paper"] = (
        f"pretrained_c{c}_K4_L20_H10_paper.pth",
        dict(case_nr=c, reference_parity=False, qg_gen_only=True, **_BEST),
    )
# The authentic IEEE case30 (utils/cases.py) needs the oracle-consistent
# recipe: true shunts (its 19 MVAr bank at bus 10 is erased by the paper
# defaults), NR's own dispatch convention, and the weak high-voltage-
# branch tie-breaker — under reference-strength augmentation the branches
# come close enough that pure-residual training drifts onto low-voltage
# solutions (GNSConfig.v_anchor). The config must match training so eval
# surfaces prepare the same inputs (true_shunts drives data prep).
_PRETRAINED["30-paper"] = (
    "pretrained_c30_K4_L20_H10_paper.pth",
    dict(case_nr=30, reference_parity=False, qg_gen_only=True,
         dispatch="setpoint_slack", true_shunts=True, v_anchor=0.1, **_BEST),
)
# The authentic IEEE case118 (round 3) carries 14 real shunt banks and
# stiff 345 kV branches that scale the textbook residual ~1e4x case14's:
# unclipped Adam stalls at a ~5e4 plateau (measured, /tmp-logged runs at
# v MSE 0.042-0.046), while the oracle-consistent recipe WITH
# grad_clip=1.0 + 300-step warmup trains to v MSE 0.000386 vs NR. Its
# checkpoint therefore carries the case30-style oracle-consistent config
# (true_shunts drives data prep at eval time too).
_PRETRAINED["118-paper"] = (
    "pretrained_c118_K4_L20_H10_paper.pth",
    dict(case_nr=118, reference_parity=False, qg_gen_only=True,
         dispatch="setpoint_slack", true_shunts=True, v_anchor=0.1,
         grad_clip=1.0, warmup_steps=300, **_BEST),
)
# case14 also carries a real shunt (19 MVAr at bus 9) — the oracle-
# consistent recipe measured 1.23x better there (v MSE 0.00096 vs
# 0.00119) and ships; on the shunt-free cases (9/300-synthetic) it
# was a wash-to-slightly-worse, so those keep the λ/paper-shunt recipe.
_PRETRAINED["14-paper"] = (
    "pretrained_c14_K4_L20_H10_paper.pth",
    dict(case_nr=14, reference_parity=False, qg_gen_only=True,
         dispatch="setpoint_slack", true_shunts=True, v_anchor=0.1, **_BEST),
)
# "{c}-sup" — fine-tuned supervised against the Newton-Raphson oracle
# (tools/train_supervised.py: loss = sup + 0.1 * physics on NR-feasible
# grids; the reference only ever uses NR for evaluation,
# GNS/evaluate.py:25-40). The most oracle-accurate shipped weights at the
# reference's best architecture. case300 trains at augmentation scale=0.5
# like its paper sibling.
for c in (9, 14, 30, 118, 300):
    _PRETRAINED[f"{c}-sup"] = (
        f"pretrained_c{c}_K4_L20_H10_sup.pth",
        dict(case_nr=c, reference_parity=False, qg_gen_only=True, **_BEST),
    )
# case30's and case118's supervised fine-tunes inherit the true-shunt
# input convention of their -paper warm starts (see above).
_PRETRAINED["118-sup"] = (
    "pretrained_c118_K4_L20_H10_sup.pth",
    dict(case_nr=118, reference_parity=False, qg_gen_only=True,
         true_shunts=True, **_BEST),
)
_PRETRAINED["30-sup"] = (
    "pretrained_c30_K4_L20_H10_sup.pth",
    dict(case_nr=30, reference_parity=False, qg_gen_only=True,
         true_shunts=True, **_BEST),
)
_PRETRAINED["14-sup"] = (
    "pretrained_c14_K4_L20_H10_sup.pth",
    dict(case_nr=14, reference_parity=False, qg_gen_only=True,
         true_shunts=True, **_BEST),
)


# "{c}-n1" — outage-aware models (tools/exp_outage_aware.py): admittance-
# space message features (GNSConfig.admittance_inputs) + training on
# grids with randomly outaged branches encoded as r=x=1e6, b=0 (a
# well-scaled zero in admittance space; eval/contingency.py
# encode_impedance). The first model family that can SEE an N-1
# contingency — the reference's raw-impedance schema cannot represent
# one. Measured (64 held-out outaged grids, v MSE vs the
# post-contingency NR solution, vs the blind {c}-paper fed the intact
# grid — the best a status-blind schema can do):
#   case14: aware 0.00127 vs blind 0.00223 (1.76x; severest-quartile
#   outages 2.38x), at zero cost on the ordinary task (0.000937 vs
#   0.000964 on non-outaged grids).
#   case118: an honest NEGATIVE — blind 0.000413 beats aware 0.000496,
#   even on the severest quartile (0.94x): case118 is so meshed that
#   single-outage voltage shifts (severity p90 6.7e-5 p.u.^2) sit BELOW
#   both models' error floor (~4e-4), so there is no outage signal to
#   exploit. Outage-awareness pays exactly when outage severity exceeds
#   the model floor (case14 p90 severity 4.4e-3 >> floor 1e-3). The
#   118-n1 checkpoint ships as the stressed-network demonstrator with
#   this caveat.
_PRETRAINED["14-n1"] = (
    "pretrained_c14_K4_L20_H10_n1.pth",
    dict(case_nr=14, reference_parity=False, qg_gen_only=True,
         dispatch="setpoint_slack", true_shunts=True, v_anchor=0.1,
         admittance_inputs=True, **_BEST),
)
_PRETRAINED["118-n1"] = (
    "pretrained_c118_K4_L20_H10_n1.pth",
    dict(case_nr=118, reference_parity=False, qg_gen_only=True,
         dispatch="setpoint_slack", true_shunts=True, v_anchor=0.1,
         admittance_inputs=True, grad_clip=1.0, warmup_steps=300, **_BEST),
)
# "118-deep-n1" (round 4b) — the deep AWARE model, shipped for RANKING
# (tools/exp_deep_ranking.py). Absolute accuracy still loses to deep
# blind (ROADMAP 9a': outage severity sits below even the halved
# floor), but the ranked screen needs only ORDER, and the deep aware's
# ~2.3x-lower floor gives its deviation score more signal-to-noise:
# ranked-screen recall of the true worst set on the full authentic
# case118 outage set 0.619 @ k=16/32 vs the K4 118-n1's 0.524 (tie
# 0.81 @ k=64). Use it for screen_n1_ranked; use 118-deep-sup for
# state accuracy.
_PRETRAINED["118-deep-n1"] = (
    "pretrained_c118_K8_L40_H10_n1.pth",
    dict(case_nr=118, K=8, latent_dim=40, hidden_dim=10,
         multiple_phi=True, reference_parity=False, qg_gen_only=True,
         dispatch="setpoint_slack", true_shunts=True, v_anchor=0.1,
         admittance_inputs=True, grad_clip=1.0, warmup_steps=300,
         init_correction_scale=0.1),
)

# Round-4 growth of the n1 family (tools/exp_multi_n1.py): "multi-n1" is
# the admittance-space GENERALIST (one model, outage-augmented grids of
# all five cases — the cross-case regularization that beats branch drift,
# ROADMAP #7, now in the outage-aware representation), and "30-n1" is its
# gentle (lr 1e-4) case30 fine-tune — the exact recipe that fixed plain
# case30, applied to resolve the ROADMAP #9 confound. Measured (64
# fully-outaged held-out grids, v MSE vs post-contingency NR):
#   multi-n1: c9 0.00327 / c14 0.00340 / c30 0.00923 / c118 0.00061 /
#   c300* 0.00121.
#   30-n1: 0.0111 — the round-3 CONFOUND IS RESOLVED: cold-start aware
#   training scored 0.037 (the branch-drift trap); warm-starting from
#   the generalist eliminates the drift (3.3x). What remains is a CLEAN
#   measured negative: the blind 30-paper baseline scores 0.0084 on the
#   same outaged grids, so case30 sits with case118 on the
#   below-error-floor side of the severity boundary (its single-branch
#   outages move voltages less than the model floor; case14's do not —
#   aware wins 1.76x there). 30-n1 ships as the best AWARE case30 model
#   (the ranked N-1 screen needs the representation's differential
#   signal, not absolute accuracy).
#   Warm-started 14/118 re-runs (14-n1w 0.00140 vs shipped 0.00127;
#   118-n1w 0.000548 vs shipped 0.000496) measured WORSE than the
#   cold-start specialists — exports skipped, shipped checkpoints stand.
_PRETRAINED["multi-n1"] = (
    "pretrained_multi_K4_L20_H10_n1.pth",
    dict(case_nr=0, reference_parity=False, qg_gen_only=True,
         dispatch="setpoint_slack", true_shunts=True, v_anchor=0.1,
         admittance_inputs=True, grad_clip=1.0, warmup_steps=300, **_BEST),
)
_PRETRAINED["30-n1"] = (
    "pretrained_c30_K4_L20_H10_n1.pth",
    dict(case_nr=30, reference_parity=False, qg_gen_only=True,
         dispatch="setpoint_slack", true_shunts=True, v_anchor=0.1,
         admittance_inputs=True, **_BEST),
)


def available_cases():
    """Registry keys with a shipped checkpoint actually present on disk
    (ints for the per-case checkpoints, then string variant names)."""
    present = [
        k for k, (name, _) in _PRETRAINED.items()
        if os.path.exists(os.path.join(_ASSET_DIR, name))
    ]
    return sorted([k for k in present if isinstance(k, int)]) + sorted(
        k for k in present if isinstance(k, str)
    )


# Friendly aliases (e.g. the training tool's --which name for the deep
# case300 variant).
_ALIASES = {"deep300": "300-deep"}


def _lookup(key):
    key = _ALIASES.get(key, key)
    try:
        return _PRETRAINED[key]
    except KeyError:
        raise KeyError(
            f"no pretrained checkpoint {key!r}; available: {available_cases()}"
        ) from None


def pretrained_path(case_nr=14) -> str:
    """Absolute path of the shipped .pth for a case number or variant key."""
    name, _ = _lookup(case_nr)
    return os.path.join(_ASSET_DIR, name)


def pretrained_config(case_nr=14) -> GNSConfig:
    """The GNSConfig the shipped checkpoint was trained at."""
    _, kw = _lookup(case_nr)
    return GNSConfig(**kw)


def load_pretrained(case_nr=14):
    """Return (params, cfg) for a shipped checkpoint (case number or
    variant key such as "300-deep" / "multi")."""
    from gns_tpu.models.import_torch import load_torch_checkpoint

    cfg = pretrained_config(case_nr)
    return load_torch_checkpoint(pretrained_path(case_nr), cfg), cfg
