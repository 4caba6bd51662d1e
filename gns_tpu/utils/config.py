"""Configuration layer.

The reference has no config system — every knob is an edit-in-place constant
(reference: GNS/main.py:210-214,235-254; GNS/evaluate.py:21-22,61-63). Here
all of it is a frozen dataclass with per-case presets, plus the
`reference_parity` flag that gates the reference's load-bearing quirks
(SURVEY.md §2.4, Q1-Q4).
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class GNSConfig:
    """Hyperparameters of the GNS model + training driver.

    Defaults follow the reference's stated best configuration
    (reference: README.md:16 — K=4, latent 20, hidden 10, multiple_phi, gamma .9).
    """

    # --- model (reference: GNS/main.py:108 GNS.__init__ defaults) ---
    latent_dim: int = 20
    hidden_dim: int = 10
    K: int = 4
    gamma: float = 0.9
    multiple_phi: bool = True
    leaky_relu_slope: float = 0.01  # torch nn.LeakyReLU default

    # When True, reproduce the reference's exact numerical behavior,
    # including quirks Q1 (single-phi writes only latent column 0),
    # Q2 (per-line arrays indexed by bus ids) and Q4 (asymmetric reactive
    # message). When False, use the paper-correct physics equations.
    reference_parity: bool = True

    # --- paper-mode physics conventions (require reference_parity=False) ---
    # The reference computes the reactive set-point qg_new at EVERY bus from
    # the same flow expressions the imbalance subtracts (GNS/main.py:64-76 vs
    # :98-102), so delta_q cancels identically — the training loss carries NO
    # reactive signal (quirk Q8), which leaves load-bus voltage magnitudes
    # unconstrained and lets large-case training converge to wrong-voltage
    # branches (ROADMAP #6). qg_gen_only=True restores the paper's PV/PQ
    # split: reactive generation only at buses hosting a generator, so
    # delta_q is a live residual at load buses that anchors |v|.
    qg_gen_only: bool = False
    # Generator active-power convention:
    #   "lambda"          — the reference/paper global compensation: every
    #                       generator is redispatched by the scalar factor
    #                       lambda (GNS/main.py:47-57). Its optimum is a
    #                       distributed-slack power flow whose dispatch can
    #                       differ from Newton-Raphson's by the whole loss
    #                       share (measured: up to 7.7 p.u. on case118).
    #   "setpoint_slack"  — Newton-Raphson's convention: generators hold
    #                       their set-points, the slack bus (type 3) absorbs
    #                       the imbalance and its delta_p is excluded from
    #                       the residual. The loss minimum then IS the NR
    #                       solution (residual floor ~1e-4, only the paper
    #                       shunts).
    dispatch: str = "lambda"
    # Optional slack-anchor loss weight: adds
    #   slack_anchor * gamma^(K-k) * sum_slack(theta^2) / N
    # to each step's loss, pinning the predicted angle gauge at the slack
    # bus. The physics residual is invariant under a global angle shift
    # (only differences enter the flows), so without an anchor the raw
    # predicted angles carry an arbitrary offset; eval decodes it away by
    # slack alignment (eval/harness.py align_slack_angle), which makes
    # this knob a training-time regularizer rather than a requirement.
    # Anchors to theta_slack = 0, the slack-relative gauge; the eval
    # decode adds the case's actual slack Va (0 for most shipped cases;
    # the authentic IEEE case118 stores Va=30 deg at its slack bus 69).
    slack_anchor: float = 0.0
    # Data-prep convention for the physics residual's shunt terms. The
    # reference overwrites every bus's Gs/Bs with the paper defaults
    # +1/-1 MVA before normalization (GNS/utils.py:23-26), so its residual
    # models a grid with uniform 0.01 p.u. shunts at every bus while the
    # Newton-Raphson oracle solves the case's TRUE shunts (the authentic
    # IEEE case30 has a 19 MVAr bank at bus 10 the paper defaults erase).
    # true_shunts=True keeps the case's own Gs/Bs columns (still /baseMVA),
    # making the textbook residual model exactly the grid the oracle
    # solves; with dispatch="setpoint_slack" the objective's minimum is
    # then the NR solution itself. Measured effect (authentic case30,
    # shipped-checkpoint budget): best with setpoint_slack (v MSE 0.060 vs
    # 0.070 paper-shunt λ); with the λ dispatch alone it HURTS (0.44 — the
    # distributed-slack optimum plus live load-bus reactive residual walks
    # to a far dispatch), so the knob ships paired with setpoint_slack.
    # Data-prep surfaces thread `paper_shunts=not cfg.true_shunts`;
    # reference-parity mode must keep the default (False) for bit parity.
    true_shunts: bool = False
    # Admittance-space message features (paper mode): the learned message
    # MLPs see (g, b_series, b, tau, shift) with g = r/(r^2+x^2),
    # b_series = -x/(r^2+x^2) instead of raw (r, x, b, tau, shift). The
    # reference feeds raw impedances (GNS/utils.py:29-33), which makes an
    # out-of-service branch UNREPRESENTABLE in-distribution (there is no
    # r/x value meaning "no line"; the schema has no status column). In
    # admittance space an outage is a well-scaled zero: encode it as
    # r=x=1e6, b=0 (eval/contingency.py encode_impedance) and both the
    # learned messages AND the physics residual (which always consumes
    # raw r/x/b and sees admittance ~0) model the outage consistently —
    # the basis of the outage-aware N-1 models
    # (tools/exp_outage_aware.py). Physics/parity are untouched: only the
    # MLP input representation changes.
    admittance_inputs: bool = False
    # Weak high-voltage-branch tie-breaker: adds
    #   v_anchor * gamma^(K-k) * sum_nongen((v - 1)^2) / N
    # per step. The AC power-flow residual is solution-branch-agnostic —
    # the equations admit multiple solutions and the physics loss scores
    # the low-voltage branches exactly as well as the high-voltage one
    # Newton-Raphson (flat-start) returns. On mildly perturbed grids the
    # model stays in the high-voltage basin by initialization (v starts
    # at 1/vg), but under the reference-strength augmentation of the
    # authentic case30 the branches come close enough that pure-residual
    # training drifts onto low-voltage branches as the residual improves
    # (measured: 800-epoch setpoint_slack+true_shunts run, residual
    # 0.0157 but v MSE vs NR 0.499 — better fit, wrong branch). A weak
    # (v-1)^2 prior on the free (non-generator) buses breaks the tie
    # toward the oracle's branch; it is a tie-breaker, not a target — at
    # the NR solution its gradient is O(v_anchor * |v-1|), far below the
    # residual curvature for weights ~0.03-0.1.
    v_anchor: float = 0.0

    # --- training (reference: GNS/main.py:235-254) ---
    case_nr: int = 14
    batch_size: int = 128
    nr_samples: int = 256
    epochs: int = 101
    optimizer: str = "adam"  # "adam" | "adagrad"
    learning_rate: Optional[float] = None  # None -> per-optimizer default
    # Linear LR warmup over this many optimizer steps (0 = off). The
    # reference sketches (but comments out) an equivalent warmup scheduler
    # at GNS/main.py:245-247.
    warmup_steps: int = 0
    # Global-norm gradient clipping (0 = off, the reference behavior).
    # Needed for paper-mode training on the authentic IEEE case118: its
    # stiff 345 kV branches (|y| ~ 250 p.u.) scale the textbook residual
    # and its gradients ~1e4x case14's, and unclipped Adam stalls at a
    # ~1e4 plateau (measured; see ROADMAP).
    grad_clip: float = 0.0
    # Scale factor on the OUTPUT-layer init (w4/b4) of the update heads
    # L_theta/L_v/L_m (1.0 = the torch-default init, the reference
    # behavior). Deep stacks on stiff networks need < 1: at K=8 on the
    # authentic case118 the torch-default init's 8 uncontrolled
    # correction steps blow |v| up to ~1e22 and the INITIAL forward is
    # already NaN — no gradient signal exists to recover from. A small
    # scale starts the model near identity (corrections ~0, v near its
    # start), where the loss is finite and training can proceed. Only
    # meaningful for fresh inits; parity mode rejects != 1.0 (the
    # reference has no such knob).
    init_correction_scale: float = 1.0
    early_stop_patience: int = 2  # non-improving epochs tolerated (main.py:296-304)
    seed: int = 0

    # --- execution ---
    # Storage dtype of parameters/state (keep float32: Adam moments and the
    # physics residual need it).
    dtype: str = "float32"
    # MLP compute dtype: "bfloat16" runs the LearningBlock matmuls natively
    # on the MXU with bf16 activations (halves HBM/VMEM traffic of the edge
    # stage); state updates and physics stay float32. Not parity-grade —
    # use float32 with reference_parity.
    compute_dtype: str = "float32"
    # Fold the three phi heads (shared edge input) and the three L heads
    # into single block MLPs per step: 3x fewer matmul/segment-sum ops on
    # the op-count-bound TPU step. Exact up to float reassociation (the
    # off-diagonal weight blocks are zeros). See models/gns.py
    # fuse_step_params.
    fused_heads: bool = True
    # Fold the phi output projection into the L heads' first layer
    # ("aggregate-then-project"): since the edge aggregation is linear,
    #   agg((H2 @ W4 + b4) * mask) @ W1a == agg(H2 * mask) @ (W4 @ W1a)
    #                                       + deg * (b4 @ W1a)
    # so the (E, 3H) -> (E, 3L) output matmul on edge rows disappears and
    # the aggregation runs at width 3*hidden instead of 3*latent (30 vs 60
    # at the headline config — the aggregation is the step's largest MXU
    # contraction). deg is the masked in-degree, appended as one extra node
    # feature whose weight row is b4 @ W1a. Exact in real arithmetic;
    # reassociates float contractions, so 'auto' enables it only for
    # bfloat16 compute (the production path), keeping float32 parity
    # numerics unchanged. 'on' / 'off' force it.
    fold_output: str = "auto"
    # Lowering of bus->edge gathers (ops/segment.py gather): 'take'
    # (jnp.take; VJP is an XLA scatter), 'onehot' (G(E,N) @ data matmul;
    # VJP is the transposed matmul, scatter-free), 'hybrid' (take forward
    # with a custom one-hot-matmul VJP — cheap copy forward AND
    # scatter-free backward; dominates on TPU), or 'auto': hybrid on TPU,
    # take elsewhere.
    gather_method: str = "auto"
    # Unroll factor of the K-step lax.scan. 0 = auto: fully unroll when
    # K <= 12, else rolled. Unrolling lets XLA fuse across correction
    # steps — measured +30% training throughput at K=4 (189 vs 145 M
    # edges/s) — at the cost of code size / compile time, which is why
    # deep-K configs stay rolled by default.
    scan_unroll: int = 0

    @property
    def resolved_fold_output(self) -> bool:
        if self.fold_output == "on":
            return True
        if self.fold_output == "off":
            return False
        if self.fold_output != "auto":
            raise ValueError(f"fold_output must be auto/on/off, got {self.fold_output!r}")
        return (
            self.fused_heads
            and self.multiple_phi
            and self.compute_dtype == "bfloat16"
        )

    @property
    def resolved_scan_unroll(self) -> int:
        if self.scan_unroll > 0:
            return self.scan_unroll
        return self.K if self.K <= 12 else 1
    # Rematerialize each correction step in the backward pass
    # (jax.checkpoint around the scanned step). Measurement history at the
    # headline config (case300 K=4 b256 bf16 fold): with take-VJP
    # scatters in the backward, remat won (1.43 vs 1.80 ms/step — the
    # scatter-laden backward was residual-traffic-bound); with the hybrid
    # custom-VJP ops the backward is scatter-free and cheap, and remat
    # only adds recompute (0.93 no-remat vs 1.18 remat). "auto" therefore
    # resolves to off; True forces it for memory-bound configs (deep K,
    # huge batches) where residuals would not fit HBM.
    remat: object = "auto"

    @property
    def resolved_remat(self) -> bool:
        if isinstance(self.remat, bool):
            return self.remat
        if self.remat != "auto":
            raise ValueError(f"remat must be auto/True/False, got {self.remat!r}")
        return False

    @property
    def lr(self) -> float:
        if self.learning_rate is not None:
            return self.learning_rate
        # reference: GNS/main.py:236-243 — Adam 1e-3, Adagrad 1e-2.
        return 0.01 if self.optimizer == "adagrad" else 0.001

    @property
    def phi_in_dim(self) -> int:
        return 5 + self.latent_dim

    @property
    def update_in_dim(self) -> int:
        return 4 + 2 * self.latent_dim

    def replace(self, **kw) -> "GNSConfig":
        return dataclasses.replace(self, **kw)


# Per-case presets mirroring BASELINE.json's five benchmark configs.
PRESETS = {
    # case14 CPU-reference config (PR1): reference best hyperparameters.
    "case14": GNSConfig(case_nr=14),
    # case9/case30 augmented grids, same K=4 model.
    "case9": GNSConfig(case_nr=9),
    "case30": GNSConfig(case_nr=30),
    # case118, larger batches.
    "case118": GNSConfig(case_nr=118, batch_size=512, nr_samples=2048),
    # case300 deeper variant for single-host multi-chip edge partition.
    "case300": GNSConfig(
        case_nr=300, K=8, latent_dim=40, batch_size=512, nr_samples=2048
    ),
    # eval checkpoint config of the reference (GNS/evaluate.py:61-63).
    "eval_reference": GNSConfig(K=6, latent_dim=20, hidden_dim=10, multiple_phi=False),
}


def preset(name: str) -> GNSConfig:
    try:
        return PRESETS[name]
    except KeyError:
        raise KeyError(f"unknown preset {name!r}; available: {sorted(PRESETS)}")
