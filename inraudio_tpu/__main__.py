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
    fit.add_argument("--profile", action="store_true",
                     help="capture a jax.profiler trace of one post-compile "
                          "round into <exp>/trace/")
    fit.add_argument("--num-channels", type=int, default=1,
                     help="channels for method=multi (reference run.py:30)")
    fit.add_argument("--first-linear", action="store_true",
                     help="first layer Linear+Snake instead of SineLayer "
                          "(reference run.py:96)")
    fit.add_argument("--no-last-linear", dest="last_linear",
                     action="store_false",
                     help="final layer SineLayer instead of SIREN-init "
                          "Linear (reference models.py:374-384)")
    fit.add_argument("--grad-clip-norm", type=float, default=0.0,
                     help="global-norm gradient clipping (0 = off)")
    fit.add_argument("--plateau-factor", type=float, default=0.8)
    fit.add_argument("--plateau-patience", type=int, default=200)
    fit.add_argument("--multi-resolution-stft", action="store_true",
                     help="multi-resolution STFT loss term (the reference's "
                          "commented MultiResolutionSTFTLoss, run.py:127)")
    fit.add_argument("--n-fft", type=int, default=1024,
                     help="STFT size for method=fft (reference utils.py:250)")
    fit.add_argument("--highpass", action="store_true",
                     help="pre-filter for fft (100 Hz) / mdct (150 Hz) "
                          "targets (reference utils.py:242,321)")
    fit.add_argument("--perceptual-mask", action="store_true",
                     help="hearing-threshold loss weighting for method=mdct "
                          "(reference's drafted mask, utils.py:365-376)")
    fit.add_argument("--adaptive", action="store_true",
                     help="block-switching STMDCT target for method=mdct "
                          "(pre-echo control)")
    fit.add_argument("--update-grid-every", type=int, default=0,
                     help="KAN data-adaptive grid refresh period in steps "
                          "(reference kan.py:274-279; 0 = never)")
    fit.add_argument("--scaled-first", action="store_true",
                     help="first layer = ScaledSineLayer (per-neuron omega "
                          "linspace, reference models.py:124-183)")
    fit.add_argument("--encoding", default="rff", choices=["rff", "nerf"],
                     help="input featurisation used with --num-freq: "
                          "Gaussian RFF or NeRF positional encoding "
                          "(reference models.py:14-59)")

    enc = sub.add_parser(
        "encode", help="compress a wav into an INRA payload (multi-INR codec; .npz output paths select the legacy container)")
    enc.add_argument("--input", required=True)
    enc.add_argument("--output", required=True)
    enc.add_argument("--chunk-s", type=float, default=0.25)
    enc.add_argument("--overlap", type=float, default=0.1)
    enc.add_argument("--hidden", type=int, default=128)
    enc.add_argument("--omega", type=float, default=1800.0)
    enc.add_argument("--learning-rate", type=float, default=7e-4)
    enc.add_argument("--total-steps", type=int, default=3000)
    enc.add_argument("--quantize", default="float16",
                     choices=["none", "float16", "bfloat16", "int8", "int16",
                              "int4", "auto"])
    enc.add_argument("--per-row-scales", action="store_true",
                     help="int modes: one quantization scale per (chunk, "
                          "output unit) — tighter grid, the int4 "
                          "rate-distortion lever")
    enc.add_argument("--fused", action="store_true",
                     help="Pallas fused kernel (TPU only)")
    enc.add_argument("--refit-steps", type=int, default=0,
                     help="quantization-aware refit: fine-tune the float32 "
                          "leaves around the frozen quantized weights")
    enc.add_argument("--max-chunks", type=int, default=0,
                     help="train the chunk population in batches of this "
                          "size (bounds device memory for long inputs; "
                          "0 = all at once)")
    enc.add_argument("--target-bps", type=float, default=None,
                     help="pick the measured rate-distortion operating "
                          "point fitting this bits/sample budget "
                          "(calibrated on 44.1 kHz material).  Pins every "
                          "calibrated knob: --chunk-s, --overlap, --hidden, "
                          "--omega, --learning-rate, --quantize, "
                          "--per-row-scales, --refit-steps; only "
                          "--total-steps, --fused and --max-chunks pass "
                          "through")
    enc.add_argument("--all-channels", action="store_true",
                     help="encode every channel of a multichannel file "
                          "(one stacked chunk population, single launch); "
                          "default keeps channel 0 like the reference")
    enc.add_argument("--side-quantize", choices=["auto", "on", "off"],
                     default="auto",
                     help="fp16 storage for the layers-1+ side leaves "
                          "(biases, snake a): 'auto' (default) ships them "
                          "fp16 only below ~70 dB estimated fit — free "
                          "there, but -2.75 dB on a ~96 dB fit (r4)")
    enc.add_argument("--plateau-patience", type=int, default=None,
                     help="ReduceLROnPlateau patience in steps (default "
                          "200 for both codec families; the decode-fixed "
                          "r4 A/B found fast decay (35) never beats it, "
                          "while hi-fi points calibrate best near 75)")
    enc.add_argument("--modulated", action="store_true",
                     help="shared-backbone codec mode: ONE network for the "
                          "whole clip + a tiny per-chunk modulation vector "
                          "(COIN++-class; --quantize applies to the "
                          "modulations: none/float16/int8/int16/auto)")
    enc.add_argument("--film-scale", action="store_true",
                     help="with --modulated: per-unit gains as well as "
                          "shifts (2x modulation bytes, full FiLM)")
    enc.add_argument("--mods-lr-mult", type=float, default=1.0,
                     help="with --modulated: modulation lr as a multiple "
                          "of the backbone's (hotter modulations converge "
                          "faster; +6 dB at equal steps in the r3 probe)")
    enc.add_argument("--segment-s", type=float, default=None,
                     help="with --modulated: one backbone per this many "
                          "seconds instead of per clip (backbone capacity "
                          "per content-second sets the quality ceiling; "
                          "the chunk grid stays global)")

    dec = sub.add_parser("decode", help="decode an INRA/npz payload back to wav")
    dec.add_argument("--input", required=True, nargs="+",
                     help="payload path(s); several paths decode as ONE "
                          "batched serving dispatch (decode_many: "
                          "compatible payloads' chunk populations "
                          "concatenate into a single stacked eval — the "
                          "stitched decode is transport-bound on dispatch "
                          "overhead, so N clips/call beats N calls)")
    dec.add_argument("--output", required=True, nargs="+",
                     help="one wav path per input")
    dec.add_argument("--fused", choices=["auto", "on", "off"],
                     default="auto",
                     help="fused Pallas decode: auto (kernel when the "
                          "payload was fused-trained and a TPU is present), "
                          "on (force the kernel), off (force the exact XLA "
                          "apply — the escape hatch if auto-routing "
                          "misbehaves)")
    dec.add_argument("--max-chunks", type=int, default=0,
                     help="decode the chunk population in batches of this "
                          "size (bounds device memory; 0 = all at once)")
    dec.add_argument("--upsample", type=int, default=1,
                     help="decode on an N-times denser grid "
                          "(INR bandwidth extension)")
    dec.add_argument("--start", type=float, default=None,
                     help="random-access decode: range start in seconds "
                          "(only the chunks overlapping [start, stop) are "
                          "evaluated — O(range) seek)")
    dec.add_argument("--stop", type=float, default=None,
                     help="random-access decode: range stop in seconds")

    info = sub.add_parser(
        "info", help="inspect a compressed payload without decoding: codec "
                     "config, quantization tiers, per-leaf storage, "
                     "bits/sample")
    info.add_argument("--input", required=True)
    info.add_argument("--json", action="store_true",
                      help="emit the full machine-readable record")

    fm = sub.add_parser(
        "fit-multi",
        help="chunk-parallel multi-INR fit of a wav (the bench recipe): "
             "fit, stitch, report SNR, write the reconstruction")
    fm.add_argument("--input", required=True)
    fm.add_argument("--output", required=True)
    fm.add_argument("--chunk-s", type=float, default=0.01161)
    fm.add_argument("--overlap", type=float, default=0.1)
    fm.add_argument("--hidden", type=int, default=128)
    fm.add_argument("--omega", type=float, default=115.0)
    fm.add_argument("--learning-rate", type=float, default=1e-3)
    fm.add_argument("--grad-clip", type=float, default=1.0)
    fm.add_argument("--total-steps", type=int, default=3000)
    fm.add_argument("--fused", action="store_true",
                    help="Pallas fused kernel + polynomial sin (TPU only)")
    fm.add_argument("--metrics", default=None,
                    help="stream per-round JSONL metrics to this path")
    fm.add_argument("--max-chunks", type=int, default=0,
                    help="train in batches of this many chunks (bounds "
                         "device memory for long inputs; 0 = all at once)")

    args = ap.parse_args(argv)
    if args.cmd == "fit":
        from .experiments import train
        kw = {k: v for k, v in vars(args).items()
              if k not in ("cmd", "no_plots", "experiment_path", "tag")}
        kw["make_plots"] = not args.no_plots
        ckpt = train(args.experiment_path, args.tag, **kw)
        print(json.dumps({"ckpt": ckpt}))
    elif args.cmd == "encode":
        # fail fast on flag conflicts, before any file I/O or training —
        # silently ignoring a requested bitrate/refit would be worse
        if args.modulated:
            for flag, on in (("--target-bps", args.target_bps is not None),
                             ("--per-row-scales", args.per_row_scales),
                             ("--fused", args.fused),
                             ("--max-chunks", bool(args.max_chunks))):
                if on:
                    ap.error(f"{flag} does not apply to --modulated")
            if args.quantize in ("bfloat16", "int4"):
                ap.error("--modulated quantizes the modulations: use "
                         "none, float16, int8, int16 or auto")
            if args.refit_steps > 0 and args.quantize == "none":
                ap.error("--refit-steps with --modulated needs quantized "
                         "modulations (--quantize float16/int8/int16)")
        elif args.film_scale:
            ap.error("--film-scale requires --modulated")
        elif args.segment_s is not None:
            ap.error("--segment-s requires --modulated")
        elif args.mods_lr_mult != 1.0:
            ap.error("--mods-lr-mult requires --modulated")
        elif args.quantize == "auto":
            ap.error("--quantize auto requires --modulated (the fp16/int16 "
                     "switch is a modulation-tier rule)")
        import numpy as np
        from .codec import CodecConfig, compression_stats, encode, save_inr
        from .data.audio_io import read_wav
        from .dsp import calculate_snr
        from .codec import decode as _dec
        fs, sig = read_wav(args.input,
                           channel=None if args.all_channels else 0)
        import time as _time
        _t_enc = _time.time()
        if args.modulated:
            from .codec import ModulatedCodecConfig, encode_modulated
            q = None if args.quantize == "none" else args.quantize
            payload = encode_modulated(sig.astype(np.float32), fs,
                                       ModulatedCodecConfig(
                chunk_seconds=args.chunk_s, overlap_fraction=args.overlap,
                hidden_features=args.hidden, first_omega_0=args.omega,
                learning_rate=args.learning_rate,
                total_steps=args.total_steps, quantize_mods=q,
                film_scale=args.film_scale,
                mods_lr_mult=args.mods_lr_mult,
                segment_s=args.segment_s,
                # --refit-steps means the quantization-aware refit in both
                # modes: float leaves there, the backbone here
                refit_backbone_steps=args.refit_steps,
                **({"plateau_patience": args.plateau_patience}
                   if args.plateau_patience is not None else {})))
        else:
            cfg = CodecConfig(
                chunk_seconds=args.chunk_s, overlap_fraction=args.overlap,
                hidden_features=args.hidden, first_omega_0=args.omega,
                learning_rate=args.learning_rate,
                total_steps=args.total_steps,
                quantize=None if args.quantize == "none" else args.quantize,
                per_row_scales=args.per_row_scales,
                fused=args.fused, refit_steps=args.refit_steps,
                max_chunks_per_batch=args.max_chunks or None,
                side_quantize={"auto": "auto", "on": True,
                               "off": False}[args.side_quantize],
                **({"plateau_patience": args.plateau_patience}
                   if args.plateau_patience is not None else {}))
            if args.target_bps is not None:
                # cross-family planning: the modulated mode dominates parts
                # of the frontier once the backbone amortises over the clip
                from .codec import plan_for_bitrate
                n = sig.shape[0]
                ch = 1 if sig.ndim == 1 else sig.shape[1]
                kind, cfg = plan_for_bitrate(args.target_bps, n, fs,
                                             channels=ch, base=cfg)
                if kind == "modulated":
                    from .codec import encode_modulated
                    payload = encode_modulated(sig.astype(np.float32),
                                               fs, cfg)
                else:
                    payload = encode(sig.astype(np.float32), fs, cfg)
            else:
                payload = encode(sig.astype(np.float32), fs, cfg)
        _enc_s = _time.time() - _t_enc
        path = save_inr(args.output, payload)
        _, rec = _dec(payload)
        stats = compression_stats(payload, path)
        stats["snr_db"] = round(float(calculate_snr(
            sig.astype(np.float32), rec)), 3)
        stats["path"] = path
        stats["codec"] = payload["meta"].get("codec", "per_chunk")
        stats["encode_s"] = round(_enc_s, 2)
        stats["audio_s"] = round(len(sig) / fs, 3)
        import resource
        stats["peak_host_rss_mb"] = round(resource.getrusage(
            resource.RUSAGE_SELF).ru_maxrss / 1024, 1)
        print(json.dumps(stats))
    elif args.cmd == "decode":
        from .codec import (decode as _dec, decode_many, decode_range,
                            load_inr)
        from .data.audio_io import write_wav
        if len(args.input) != len(args.output):
            ap.error("--input and --output must list the same number of "
                     "paths")
        if (args.start is None) != (args.stop is None):
            ap.error("--start and --stop must be given together")
        fused = {"auto": None, "on": True, "off": False}[args.fused]
        if args.start is not None:
            if args.upsample != 1:
                ap.error("--start/--stop do not compose with --upsample")
            if len(args.input) != 1:
                ap.error("--start/--stop decode one payload at a time")
            fs, rec = decode_range(load_inr(args.input[0]), args.start,
                                   args.stop, fused=fused,
                                   max_chunks_per_batch=args.max_chunks
                                   or None)
            outs = [(fs, rec)]
        elif len(args.input) == 1:
            outs = [_dec(load_inr(args.input[0]), fused=fused,
                         upsample=args.upsample,
                         max_chunks_per_batch=args.max_chunks or None)]
        else:
            outs = decode_many([load_inr(p) for p in args.input],
                               fused=fused, upsample=args.upsample,
                               max_chunks_per_batch=args.max_chunks or None)
        for path, (fs, rec) in zip(args.output, outs):
            write_wav(path, fs, rec)
            print(json.dumps({"path": path, "sample_rate": fs,
                              "samples": int(len(rec))}))
    elif args.cmd == "info":
        from .codec import payload_info
        rec = payload_info(args.input)
        if args.json:
            print(json.dumps(rec))
        else:
            m = rec["meta"]
            mdl = m["model"]
            dur = m["signal_length"] / m["sample_rate"]
            print(f"{args.input}: {rec['container'].upper()} container, "
                  f"{rec['file_bytes']} bytes")
            line = (f"  codec: {m.get('codec', 'per-chunk')}  "
                    f"quantize: {m.get('quantize') or 'float32'}  "
                    f"model: h={mdl['hidden_features']} "
                    f"omega0={mdl['first_omega_0']}")
            if m.get("codec") == "modulated":
                line += (f"  segments: {m.get('num_segments', 1)}  "
                         f"mod_dim: {m['mod_dim']}")
            print(line)
            print(f"  signal: {dur:.2f}s @ {m['sample_rate']} Hz x "
                  f"{m.get('num_channels', 1)} ch, "
                  f"{m['num_chunks']} chunks of {m['chunk_length']} samples")
            print(f"  rate: {rec['bits_per_sample']:.2f} bits/sample "
                  f"({rec['ratio_vs_pcm16']:.2f}x vs 16-bit PCM)")
            for e in rec["leaves"]:
                shape = "x".join(str(s) for s in e["shape"])
                print(f"  {e['name']:>10} {e['dtype']:>8} {shape:>14} "
                      f"{e['enc']:>10} {e['stored_bytes']:>9} B "
                      f"({e['stored_bytes'] / max(e['raw_bytes'], 1):.2f} raw)")
    elif args.cmd == "fit-multi":
        import numpy as np
        from .data.audio_io import read_wav, write_wav
        from .dsp import calculate_snr
        from .models import SirenSnakeTanhConfig, build_model
        from .train import (MultiINRConfig, TrainConfig, multi_inr_decode,
                            multi_inr_fit)
        fs, sig = read_wav(args.input, channel=0)
        sig = sig.astype(np.float32)
        model = build_model("mlp", SirenSnakeTanhConfig(
            first_omega_0=args.omega, hidden_features=args.hidden),
            fused=args.fused, approx_sin=args.fused)
        metrics = None
        if args.metrics:
            from .utils.observability import MetricsLogger
            metrics = MetricsLogger(args.metrics)
        res = multi_inr_fit(
            model, sig, fs,
            MultiINRConfig(chunk_seconds=args.chunk_s,
                           overlap_fraction=args.overlap),
            TrainConfig(total_steps=args.total_steps,
                        learning_rate=args.learning_rate,
                        grad_clip_norm=args.grad_clip),
            metrics=metrics,
            max_chunks_per_batch=args.max_chunks or None)
        if metrics is not None:
            metrics.close()
        rec = multi_inr_decode(model, res,
                               max_chunks_per_batch=args.max_chunks or None)
        write_wav(args.output, fs, rec)
        print(json.dumps({
            "path": args.output,
            "snr_db": round(float(calculate_snr(sig, rec)), 3),
            "num_chunks": res.num_chunks,
            "train_time_s": round(res.train_time_s, 2),
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
