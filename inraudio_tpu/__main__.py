"""CLI: ``python -m inraudio_tpu fit --filename x.wav --duration 7 ...``

The reference's only CLI is "edit the __main__ block of run.py"
(README.md:5-6, run.py:404-495); this exposes the same ``train(...)`` kwarg
surface as real flags.  Every flag name matches the reference kwarg
(SURVEY.md section 5, config system).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="inraudio_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    fit = sub.add_parser("fit", help="fit an INR to an audio file")
    fit.add_argument("--experiment-path", default="results")
    fit.add_argument("--tag", default="exp")
    fit.add_argument("--filename", required=True)
    fit.add_argument("--inst", default=None)
    fit.add_argument("--duration", type=float, default=10.0)
    fit.add_argument("--method", default="wave",
                     choices=["wave", "mdct", "fft", "multi"])
    fit.add_argument("--arch", default="mlp", choices=["mlp", "kan"])
    fit.add_argument("--loss-mode", default="mse",
                     choices=["mse", "mae", "snr"])
    fit.add_argument("--total-steps", type=int, default=20000)
    fit.add_argument("--learning-rate", type=float, default=1e-3)
    fit.add_argument("--min-learning-rate", type=float, default=1e-6)
    fit.add_argument("--num-sine", type=int, default=2)
    fit.add_argument("--num-snake", type=int, default=2)
    fit.add_argument("--num-tanh", type=int, default=0)
    fit.add_argument("--hidden", type=int, default=256)
    fit.add_argument("--omega", type=float, default=22000.0)
    fit.add_argument("--hidden-omega", type=float, default=30.0)
    fit.add_argument("--a-initial", type=float, default=0.5)
    fit.add_argument("--num-freq", type=int, default=None)
    fit.add_argument("--sigma", type=float, default=10.0)
    fit.add_argument("--alpha", type=float, default=0.0)
    fit.add_argument("--decimation", type=int, default=1)
    fit.add_argument("--bwe", action="store_true")
    fit.add_argument("--takelog", action="store_true")
    fit.add_argument("--n", type=int, default=2048)
    fit.add_argument("--prev-ckpt-path", default=None)
    fit.add_argument("--seed", type=int, default=0)
    fit.add_argument("--no-plots", action="store_true")
    fit.add_argument("--fused", action="store_true",
                     help="Pallas fused kernel + polynomial sin (TPU only)")
    fit.add_argument("--visualization", action="store_true")

    args = ap.parse_args(argv)
    if args.cmd == "fit":
        from .experiments import train
        kw = {k: v for k, v in vars(args).items()
              if k not in ("cmd", "no_plots", "experiment_path", "tag")}
        kw["make_plots"] = not args.no_plots
        ckpt = train(args.experiment_path, args.tag, **kw)
        print(json.dumps({"ckpt": ckpt}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
