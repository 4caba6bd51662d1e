"""Evaluation CLI: `python -m gns_tpu.eval` (reference: GNS/evaluate.py).

Evaluates a checkpoint against the Newton-Raphson oracle on the SAME test
grids (fixing reference quirk Q6) and prints the reference's metric table.
"""

from __future__ import annotations

import argparse
import json


def main():
    p = argparse.ArgumentParser(description="Evaluate GNS vs Newton-Raphson")
    p.add_argument("--case", type=int, default=14)
    p.add_argument("--K", type=int, default=4)
    p.add_argument("--latent", type=int, default=20)
    p.add_argument("--hidden", type=int, default=10)
    p.add_argument("--multiple-phi", action="store_true", default=True)
    p.add_argument("--single-phi", dest="multiple_phi", action="store_false")
    p.add_argument("--samples", type=int, default=128)
    p.add_argument("--checkpoint", default=None,
                   help="Orbax checkpoint dir, reference .pth file, the literal "
                        "'pretrained' for the shipped per-case checkpoint, or "
                        "'pretrained:<key>' for a variant (e.g. "
                        "pretrained:300-deep, pretrained:multi); random init "
                        "if omitted")
    p.add_argument("--data-dir", default=None)
    p.add_argument("--total-grids", type=int, default=10001)
    p.add_argument("--from-base-case", action="store_true",
                   help="generate eval grids in-memory from the base case instead of pickles")
    p.add_argument("--seed", type=int, default=12345)
    p.add_argument("--scale", type=float, default=1.0,
                   help="augmentation strength for --from-base-case grids "
                        "(case300 needs <=0.5 to stay NR-solvable)")
    p.add_argument("--feasible-only", action="store_true",
                   help="rejection-sample --from-base-case grids until the "
                        "NR oracle converges on them")
    p.add_argument("--nr-backend", choices=["scipy", "batched"],
                   default="scipy",
                   help="oracle: scipy = sequential float64 (parity-grade); "
                        "batched = accelerator-batched float32 "
                        "(eval/nr_batched.py, one dispatch per set)")
    p.add_argument("--method", default="auto")
    p.add_argument("--plot", default="images/per_bus_errors.png")
    p.add_argument("--json-out", default=None)
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from gns_tpu.eval.harness import evaluate, load_eval_cases
    from gns_tpu.models.gns import init_gns_params
    from gns_tpu.utils.config import GNSConfig

    cfg = GNSConfig(
        case_nr=args.case, K=args.K, latent_dim=args.latent,
        hidden_dim=args.hidden, multiple_phi=args.multiple_phi,
    )

    if args.checkpoint and (
        args.checkpoint == "pretrained" or args.checkpoint.startswith("pretrained:")
    ):
        from gns_tpu.models.pretrained import pretrained_config, pretrained_path

        key = (
            args.checkpoint.split(":", 1)[1]
            if ":" in args.checkpoint
            else args.case
        )
        if isinstance(key, str) and key.isdigit():
            key = int(key)
        # The 'multi' variant is case-agnostic: evaluate it on --case.
        cfg = pretrained_config(key).replace(case_nr=args.case)
        args.checkpoint = pretrained_path(key)
    if args.checkpoint and args.checkpoint.endswith(".pth"):
        from gns_tpu.train.checkpoint import import_torch

        params = import_torch(args.checkpoint, cfg).params
    elif args.checkpoint:
        from gns_tpu.train.checkpoint import load_checkpoint

        params = load_checkpoint(args.checkpoint, cfg).params
    else:
        print("WARNING: no checkpoint given — evaluating a random init")
        params = init_gns_params(jax.random.key(0), cfg)

    fell_back = False
    if not args.from_base_case:
        try:
            cases = load_eval_cases(
                args.case, args.samples, data_dir=args.data_dir,
                total_grids=args.total_grids,
            )
        except FileNotFoundError as e:
            # Out-of-box path: the reference ships data/case14 so its eval
            # "just runs" (GNS/evaluate.py:31-32); we ship a generator
            # instead, so when NO dataset exists fall back to in-memory
            # grids rather than dying on a fresh clone. A PARTIALLY
            # present dataset (the case directory exists but a pickle in
            # the requested range is missing — wrong --total-grids, a
            # truncated generation) is a real error and propagates:
            # silently evaluating different grids than requested would
            # corrupt cross-run comparisons.
            import os

            from gns_tpu.utils.prepare import pickle_path

            case_dir = os.path.dirname(
                pickle_path(args.case, 0, args.data_dir)
            )
            if os.path.isdir(case_dir):
                raise
            print(f"WARNING: {e}\nWARNING: falling back to --from-base-case "
                  f"(in-memory seeded augmentation of the base case)")
            args.from_base_case = fell_back = True
    if args.from_base_case:
        from gns_tpu.utils.augment import generate_cases

        cases = list(generate_cases(
            args.case, args.samples - 1, seed=args.seed, scale=args.scale,
            feasible_only=args.feasible_only,
        ))

    m = evaluate(params, cfg, cases, method=args.method, plot_path=args.plot,
                 nr_backend=args.nr_backend)
    if fell_back:
        # Recorded in the metrics so --json-out consumers can tell these
        # numbers were measured on generated grids, not the dataset.
        m["fallback_from_base_case"] = True
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(m, f, indent=2)


if __name__ == "__main__":
    main()
