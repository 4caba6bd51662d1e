"""Experiment driver for ROADMAP #6: paper-physics training on the larger
cases converges to spurious power-flow solutions (small residual, wrong
voltage branch). Tests the candidate fixes side by side on one case:

  base             reproduce the spurious baseline (plain paper-mode train)
  warm             warm-start from the shipped reference-parity checkpoint
  anchor:W:D       auxiliary v-anchor penalty W * mean((v-1)^2), linearly
                   decayed to zero over D optimizer steps (D=0: constant)
  warm+anchor:W:D  both
  qgonly           qg_gen_only=True: restore the reactive residual at load
                   buses (fixes quirk Q8's cancelling delta_q)
  nrconv           qg_gen_only=True + dispatch="setpoint_slack": the full
                   NR-convention objective whose minimum IS the NR solution
  parity           no training: score the shipped reference-parity
                   checkpoint on the same held-out grids (baseline row)

Each variant trains at the train_pretrained.py budget (1024 grids, 400
epochs, patience 20) and is scored on 64 held-out generator grids (seed
12345) against the Newton-Raphson oracle. Prints one JSON line per variant.

Usage: python tools/exp_spurious.py --case 30 --variants base warm anchor:1.0:1600
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_anchor_epoch_step(cfg, topo, w0, decay_steps, optimizer, method="auto"):
    import jax
    import jax.numpy as jnp

    from gns_tpu.models.gns import gns_forward_batch
    from gns_tpu.train.trainer import TrainState

    def loss_fn(params, batch, w):
        out = gns_forward_batch(params, cfg, batch, method=method, topo=topo)
        nb = batch.n_bus.astype(jnp.float32)
        pen = jnp.sum((out.v - 1.0) ** 2 * batch.bus_mask, axis=1) / nb
        return (
            jnp.mean(out.total_loss) + w * jnp.mean(pen),
            jnp.mean(out.last_loss),
        )

    def one_step(state, batch):
        if decay_steps > 0:
            frac = 1.0 - state.step.astype(jnp.float32) / decay_steps
            w = w0 * jnp.maximum(0.0, frac)
        else:
            w = jnp.asarray(w0, jnp.float32)
        (loss, last_loss), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, w
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        import optax

        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params, opt_state, state.step + 1),
            {"loss": loss, "last_loss": last_loss},
        )

    def epoch_fn(state, batches):
        return jax.lax.scan(one_step, state, batches)

    return jax.jit(epoch_fn, donate_argnums=(0,))


def train_variant(cfg, data, variant, epochs, patience):
    import jax
    import jax.numpy as jnp

    from gns_tpu.train.trainer import (
        init_train_state,
        make_optimizer,
        stack_epoch,
        train,
    )
    from gns_tpu.utils.prepare import extract_shared_topology

    warm = variant.startswith("warm")
    anchor = None
    for part in variant.split("+"):
        if part.startswith("anchor"):
            _, w, d = part.split(":")
            anchor = (float(w), int(d))

    state = init_train_state(jax.random.key(cfg.seed), cfg)
    if warm:
        from gns_tpu.models.pretrained import load_pretrained

        params, _ = load_pretrained(cfg.case_nr)
        state = state._replace(params=params)

    if anchor is None:
        return train(cfg.replace(epochs=epochs, early_stop_patience=patience),
                     data, state=state)

    # anchored run: custom epoch loop mirroring trainer.train semantics
    topo = extract_shared_topology(data)
    optimizer = make_optimizer(cfg)
    w0, decay = anchor
    epoch_step = make_anchor_epoch_step(cfg, topo, w0, decay, optimizer)
    stacked = stack_epoch(data, min(cfg.batch_size, data.batch_size))
    best_loss = float("inf")
    best_state = jax.device_get(state)
    bad = 0
    history = []
    for epoch in range(epochs):
        state, metrics = epoch_step(state, stacked)
        fl = float(jnp.mean(metrics["last_loss"]))
        history.append({"epoch": epoch, "final_loss": fl})
        if fl != fl or fl == float("inf"):
            break
        if fl >= best_loss:
            bad += 1
            if bad > patience:
                break
        else:
            best_loss, bad = fl, 0
            best_state = jax.device_get(state)
    return best_state, history


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", type=int, default=30)
    ap.add_argument("--grids", type=int, default=1024)
    ap.add_argument("--epochs", type=int, default=400)
    ap.add_argument("--patience", type=int, default=20)
    ap.add_argument("--eval-grids", type=int, default=64)
    ap.add_argument("--scale", type=float, default=1.0,
                    help="augmentation strength (utils/augment.py); case300 "
                         "needs <=0.5 to stay NR-feasible")
    ap.add_argument("--feasible-eval", action="store_true",
                    help="rejection-sample held-out grids until NR converges")
    ap.add_argument("--variants", nargs="+",
                    default=["base", "warm", "anchor:1.0:1600"])
    args = ap.parse_args()

    import numpy as np

    from gns_tpu.eval.harness import compute_metrics, run_gns, run_nr_oracle
    from gns_tpu.models.gns import gns_forward_batch
    from gns_tpu.utils.augment import generate_cases
    from gns_tpu.utils.config import GNSConfig
    from gns_tpu.utils.prepare import batch_from_cases, extract_shared_topology

    cfg = GNSConfig(
        case_nr=args.case, K=4, latent_dim=20, hidden_dim=10,
        multiple_phi=True, reference_parity=False, seed=0,
        batch_size=128,
    )
    data = batch_from_cases(
        list(generate_cases(args.case, args.grids, seed=0, scale=args.scale))[1:]
    )
    held_cases = list(generate_cases(
        args.case, args.eval_grids, seed=12345, scale=args.scale,
        feasible_only=args.feasible_eval,
    ))[1:]
    held = batch_from_cases(held_cases)
    held_topo = extract_shared_topology(held)
    nr = run_nr_oracle(held_cases)
    print(json.dumps({"case": args.case, "scale": args.scale,
                      "nr_converged": int(np.sum(nr["converged"])),
                      "eval_grids": len(held_cases)}), flush=True)

    for variant in args.variants:
        vcfg = cfg
        for part in variant.split("+"):
            if part == "qgonly":
                vcfg = vcfg.replace(qg_gen_only=True)
            elif part == "nrconv":
                vcfg = vcfg.replace(qg_gen_only=True, dispatch="setpoint_slack")
        if variant == "parity":
            from gns_tpu.models.pretrained import load_pretrained

            params, vcfg = load_pretrained(args.case)

            class _Best:
                pass

            best = _Best(); best.params = params
            history = [{"epoch": 0, "final_loss": float("nan")}]
            train_s = 0.0
        else:
            t0 = time.perf_counter()
            best, history = train_variant(vcfg, data, variant, args.epochs,
                                          args.patience)
            train_s = time.perf_counter() - t0
        m = compute_metrics(nr, run_gns(best.params, vcfg, held_cases))
        print(json.dumps({
            "case": args.case,
            "variant": variant,
            "epochs_run": len(history),
            "train_sec": round(train_s, 1),
            "best_train_residual": (
                None if variant == "parity"
                or not all(h["final_loss"] == h["final_loss"] for h in history)
                else round(min(h["final_loss"] for h in history), 5)),
            "heldout_residual": round(m["last_loss_mean"], 5),
            "v_mse_vs_nr": round(m["v_mse"], 6),
            "v_abs_mean": round(m["v_abs_diff_mean"], 5),
            "theta_centered_mse": round(m["theta_centered_mse"], 6),
        }), flush=True)


if __name__ == "__main__":
    main()
