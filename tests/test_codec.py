"""Audio <-> INR codec: encode/decode round trip, file format, CLI."""

import json
import os

import numpy as np
import pytest

from inraudio_tpu.codec import (CodecConfig, compression_stats, decode,
                                decode_many, encode, load_inr, save_inr)

FS = 4000


def _sig(seconds=0.5, f=220.0):
    t = np.arange(int(seconds * FS)) / FS
    return (0.7 * np.sin(2 * np.pi * f * t)).astype(np.float32)


# 200 steps fit the 220 Hz probe tone to ~59 dB — far above every
# quality assert below; more steps only slow the gate
SMALL = CodecConfig(chunk_seconds=0.1, hidden_features=32,
                    first_omega_0=200.0, total_steps=200,
                    learning_rate=1e-3, quantize=None)


@pytest.fixture(scope="module")
def small_payload():
    """(sig, payload): ONE SMALL-config float32 encode, shared by every
    test that only READS a trained payload (containers, info, range /
    stream / upsample decode).  Tests must not mutate it — copy the dicts
    before editing metadata."""
    sig = _sig()
    return sig, encode(sig, FS, SMALL)


@pytest.fixture(scope="module")
def int8_payload():
    """(sig, payload) at quantize='int8' — the shared read-only payload
    for container/storage-layer tests."""
    sig = _sig(0.4)
    cfg = CodecConfig(**{**SMALL.__dict__, "quantize": "int8"})
    return sig, encode(sig, FS, cfg)


def test_encode_decode_roundtrip_snr(small_payload):
    sig, payload = small_payload
    fs, rec = decode(payload)
    assert fs == FS and len(rec) == len(sig)
    snr = 10 * np.log10(np.sum(sig ** 2) / np.sum((sig - rec) ** 2))
    assert snr > 25, snr


@pytest.mark.parametrize("mode", ["float16", "bfloat16", "int8", "int16",
                                  "int4"])
def test_quantized_file_roundtrip(tmp_path, mode):
    # 40 steps: the file round trip is about BITS, not fit quality
    sig = _sig(0.3)
    cfg = CodecConfig(**{**SMALL.__dict__, "quantize": mode,
                         "total_steps": 40})
    payload = encode(sig, FS, cfg)
    path = save_inr(str(tmp_path / "x.inr"), payload)
    loaded = load_inr(path)
    fs, rec = decode(loaded)
    fs0, rec0 = decode(payload)
    np.testing.assert_allclose(rec, rec0, atol=1e-6)
    stats = compression_stats(payload)
    # fp16/bf16 halve fp32; int8 quarter-ish. 16 bits/param over ~3.4k
    # params per 400 samples/chunk is >1 bit/sample; just sanity-check
    assert stats["param_bytes"] > 0 and stats["bits_per_sample"] > 0


def test_cli_encode_decode(tmp_path):
    from inraudio_tpu.__main__ import main
    from inraudio_tpu.data.audio_io import write_wav
    wav = str(tmp_path / "in.wav")
    write_wav(wav, FS, _sig(0.25))
    out = str(tmp_path / "c.inr.npz")
    rc = main(["encode", "--input", wav, "--output", out,
               "--chunk-s", "0.1", "--hidden", "32", "--omega", "200",
               "--total-steps", "200", "--quantize", "float16"])
    assert rc == 0 and os.path.exists(out)
    dec = str(tmp_path / "out.wav")
    rc = main(["decode", "--input", out, "--output", dec])
    assert rc == 0 and os.path.exists(dec)


def test_decode_upsample(small_payload):
    """upsample=2 decodes the payload at twice the rate (INR BWE)."""
    sig, payload = small_payload
    fs2, rec2 = decode(payload, upsample=2)
    assert fs2 == 2 * FS and len(rec2) == 2 * len(sig)
    # the upsample grid subdivides the training grid, so every 2nd decode
    # sample sits exactly on an original-rate coordinate; only the
    # crossfade ramp weights differ between the two stitches
    fs1, rec1 = decode(payload)
    err = rec2[::2] - rec1
    snr = 10 * np.log10(np.sum(rec1 ** 2) / (np.sum(err ** 2) + 1e-20))
    assert snr > 30, snr


def test_old_format_rejected_with_versioned_error(small_payload):
    import pytest
    _, payload = small_payload
    old = dict(payload,
               meta=dict(payload["meta"], format="inraudio_tpu.inr.v1"))
    with pytest.raises(ValueError, match="v1.*re-encoded|unsupported"):
        decode(old)


@pytest.mark.parametrize("mode", ["int8", "int4"])
@pytest.mark.slow
def test_quantization_aware_refit_improves_snr(mode):
    """Refitting the float32 leaves around frozen quantized weights must
    not hurt — and should measurably help at aggressive bit widths."""
    sig = _sig(0.4)
    base = CodecConfig(**{**SMALL.__dict__, "quantize": mode})
    refit = CodecConfig(**{**SMALL.__dict__, "quantize": mode,
                           "refit_steps": 150, "refit_lr": 1e-4})
    _, rec0 = decode(encode(sig, FS, base))
    _, rec1 = decode(encode(sig, FS, refit))

    def snr(rec):
        return 10 * np.log10(np.sum(sig ** 2)
                             / max(np.sum((sig - rec) ** 2), 1e-20))

    s0, s1 = snr(rec0), snr(rec1)
    assert s1 > s0 - 0.1, (s0, s1)        # never materially worse
    if mode == "int4":
        assert s1 > s0 + 1.0, (s0, s1)    # visibly better where it matters


@pytest.mark.slow
def test_batched_encode_decode_long_input():
    """max_chunks_per_batch: device memory bounded for long clips — the
    payload and reconstruction match the unbatched contract."""
    sig = _sig(1.2)
    cfg = CodecConfig(**{**SMALL.__dict__, "max_chunks_per_batch": 4})
    payload = encode(sig, FS, cfg)
    assert payload["meta"]["num_chunks"] >= 8
    fs, rec = decode(payload, max_chunks_per_batch=4)
    assert fs == FS and len(rec) == len(sig)
    snr = 10 * np.log10(np.sum(sig ** 2) / np.sum((sig - rec) ** 2))
    assert snr > 25, snr
    # batched and unbatched decode of the same payload are identical
    _, rec_full = decode(payload)
    np.testing.assert_allclose(rec, rec_full, atol=1e-6)


@pytest.mark.slow
def test_refit_respects_chunk_batching():
    """quantization_aware_refit with max_chunks_per_batch must produce a
    decodable payload of the same quality class as the unbatched refit
    (chunks are independent; per-chunk quantization scales make a slice's
    frozen weights identical to the full population's)."""
    sig = _sig(0.8)
    base = CodecConfig(**{**SMALL.__dict__, "quantize": "int8",
                          "refit_steps": 80})
    batched = CodecConfig(**{**SMALL.__dict__, "quantize": "int8",
                             "refit_steps": 80, "max_chunks_per_batch": 3})
    _, rec0 = decode(encode(sig, FS, base))
    _, rec1 = decode(encode(sig, FS, batched))

    def snr(rec):
        return 10 * np.log10(np.sum(sig ** 2)
                             / max(np.sum((sig - rec) ** 2), 1e-20))

    s0, s1 = snr(rec0), snr(rec1)
    assert s1 > s0 - 1.0, (s0, s1)


@pytest.mark.slow
def test_per_row_scales_tighten_int4(tmp_path):
    """VERDICT r2 item 7: per-(chunk, output-unit) int4 scales must beat the
    per-chunk scale on reconstruction SNR and survive a file round trip."""
    sig = _sig(0.4)
    base = {**SMALL.__dict__, "quantize": "int4", "total_steps": 600}
    p_chunk = encode(sig, FS, CodecConfig(**base))
    p_row = encode(sig, FS, CodecConfig(**{**base, "per_row_scales": True}))

    def snr(payload):
        _, rec = decode(payload)
        return 10 * np.log10(np.sum(sig ** 2)
                             / np.sum((sig - rec) ** 2))

    s_chunk, s_row = snr(p_chunk), snr(p_row)
    assert s_row > s_chunk + 1.0, (s_chunk, s_row)

    path = save_inr(str(tmp_path / "r.inr"), p_row)
    loaded = load_inr(path)
    _, rec = decode(loaded)
    _, rec0 = decode(p_row)
    np.testing.assert_allclose(rec, rec0, atol=1e-6)
    assert loaded["meta"]["per_row_scales"] is True


def test_quantize_per_row_scale_shapes():
    import jax.numpy as jnp
    from inraudio_tpu.models.quantize import (dequantize_params,
                                              quantize_params)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((3, 8, 4)).astype(np.float32))
    q = quantize_params(w, "int4", per_leading_axis=True, per_row=True)
    assert q["scale"].shape == (3, 1, 4)
    dq = dequantize_params(q)
    assert dq.shape == w.shape
    # 15-level grid per (chunk, unit): error bounded by half a step
    step = np.asarray(q["scale"])
    assert np.max(np.abs(np.asarray(dq) - np.asarray(w))
                  / np.maximum(step, 1e-12)) <= 0.5 + 1e-6


def test_decode_range_matches_full_slice(tmp_path, small_payload):
    """Random-access decode equals slicing the full decode (to ~1 ulp —
    XLA vectorizes the smaller eval batch differently): the selected chunk
    window is exactly the covering set and the stitch order is unchanged
    (codec.decode_range / multi_inr.decode_chunk_range)."""
    from inraudio_tpu.codec import decode_range

    # 0.5 s @ 4 kHz, 0.1 s chunks, 25% overlap -> 6+ chunks
    sig, payload = small_payload
    _, full = decode(payload)

    # interior range spanning several chunk boundaries
    fs, part = decode_range(payload, 0.12, 0.34)
    a, b = int(round(0.12 * FS)), int(round(0.34 * FS))
    assert fs == FS
    ulp = dict(rtol=0, atol=1e-6)
    np.testing.assert_allclose(part, full[a:b], **ulp)

    # clip start / clip end / whole clip (stop clamped to signal length)
    np.testing.assert_allclose(
        decode_range(payload, 0.0, 0.05)[1], full[: int(round(0.05 * FS))],
        **ulp)
    np.testing.assert_allclose(
        decode_range(payload, 0.45, 99.0)[1], full[int(round(0.45 * FS)):],
        **ulp)
    np.testing.assert_allclose(decode_range(payload, 0.0, 99.0)[1], full,
                               **ulp)

    # empty / inverted ranges decode to nothing
    assert decode_range(payload, 0.3, 0.3)[1].shape == (0,)
    assert decode_range(payload, 0.4, 0.2)[1].shape == (0,)

    # batched evaluation takes the same path
    np.testing.assert_allclose(
        decode_range(payload, 0.12, 0.34, max_chunks_per_batch=2)[1],
        full[a:b], **ulp)

    # CLI surface
    from inraudio_tpu.__main__ import main
    from inraudio_tpu.data.audio_io import read_wav
    inr = save_inr(str(tmp_path / "x.inr"), payload)
    out = str(tmp_path / "seg.wav")
    rc = main(["decode", "--input", inr, "--output", out,
               "--start", "0.12", "--stop", "0.34"])
    assert rc == 0
    _, seg = read_wav(out, channel=0)
    np.testing.assert_allclose(seg, full[a:b], atol=2e-4)  # wav quantization


def test_multi_inr_decode_range():
    """Library-level range decode on a MultiINRResult (no codec payload)."""
    from inraudio_tpu.models import SirenSnakeTanhConfig, build_model
    from inraudio_tpu.train import (MultiINRConfig, TrainConfig,
                                    multi_inr_decode,
                                    multi_inr_decode_range, multi_inr_fit)

    sig = _sig(0.4)
    model = build_model("mlp", SirenSnakeTanhConfig(
        hidden_features=24, first_omega_0=200.0))
    res = multi_inr_fit(model, sig, FS,
                        MultiINRConfig(chunk_seconds=0.1),
                        TrainConfig(total_steps=60))
    full = multi_inr_decode(model, res)
    part = multi_inr_decode_range(model, res, 300, 1100)
    np.testing.assert_allclose(part, full[300:1100], rtol=0, atol=1e-6)


@pytest.mark.slow
def test_stereo_encode_decode(tmp_path):
    """Multichannel codec: every channel's chunks join ONE vmapped
    population (channel-major stack), decode returns (n, c), range decode
    matches the full slice, and byte accounting counts all channels."""
    from inraudio_tpu.codec import decode_range

    sig = np.stack([_sig(0.4, 220.0), _sig(0.4, 347.0)], axis=1)
    cfg = CodecConfig(**{**SMALL.__dict__, "max_chunks_per_batch": 3})
    payload = encode(sig, FS, cfg)
    assert payload["meta"]["num_channels"] == 2
    k = payload["meta"]["num_chunks"]
    assert payload["scales"].shape == (2 * k,)

    fs, rec = decode(payload)
    assert fs == FS and rec.shape == sig.shape
    for j in range(2):
        snr = 10 * np.log10(np.sum(sig[:, j] ** 2)
                            / np.sum((sig[:, j] - rec[:, j]) ** 2))
        assert snr > 25, (j, snr)

    # random access on a stereo payload -> (range, 2)
    a, b = int(round(0.1 * FS)), int(round(0.3 * FS))
    _, part = decode_range(payload, 0.1, 0.3)
    assert part.shape == (b - a, 2)
    np.testing.assert_allclose(part, rec[a:b], rtol=0, atol=1e-6)

    # file round trip preserves channels
    path = save_inr(str(tmp_path / "st.inr"), payload)
    _, rec2 = decode(load_inr(path))
    np.testing.assert_allclose(rec2, rec, atol=1e-6)

    # bits/sample uses n*c: stereo doubles chunks AND samples -> ~equal bps
    st_m = compression_stats(encode(sig[:, 0], FS, SMALL))
    st_s = compression_stats(payload)
    assert abs(st_s["bits_per_sample"]
               - st_m["bits_per_sample"]) < 0.05 * st_m["bits_per_sample"]


@pytest.mark.slow
def test_cli_all_channels(tmp_path):
    from inraudio_tpu.__main__ import main
    from inraudio_tpu.data.audio_io import read_wav, write_wav
    wav = str(tmp_path / "st.wav")
    write_wav(wav, FS, np.stack([_sig(0.2), _sig(0.2, 300.0)], axis=1))
    out = str(tmp_path / "st.inr.npz")
    rc = main(["encode", "--input", wav, "--output", out, "--all-channels",
               "--chunk-s", "0.1", "--hidden", "24", "--omega", "200",
               "--total-steps", "150", "--quantize", "none"])
    assert rc == 0
    dec = str(tmp_path / "st_out.wav")
    rc = main(["decode", "--input", out, "--output", dec])
    assert rc == 0
    _, back = read_wav(dec)
    assert back.ndim == 2 and back.shape[1] == 2


def test_config_for_bitrate_lookup():
    """Target-bitrate selection walks the measured RD frontier: highest-SNR
    point that fits the budget; cheapest point when nothing fits; base
    knobs the table doesn't set are carried through."""
    from inraudio_tpu.codec import config_for_bitrate

    # nothing fits 1 bps -> cheapest point (h=32 int8 + refit)
    c = config_for_bitrate(1.0)
    assert (c.hidden_features, c.quantize, c.refit_steps) == (32, "int8", 400)
    # 3.2 bps -> the 3.1 point (h=40 int8 + refit), not the 4.5 one
    c = config_for_bitrate(3.2)
    assert (c.hidden_features, c.quantize) == (40, "int8")
    # 4.5 exactly -> the 4.5 point (5% tolerance)
    c = config_for_bitrate(4.5)
    assert (c.hidden_features, c.quantize, c.refit_steps) == (48, "int8", 0)
    # 500 bps budget -> the 452.9 bps fp32-weight point (100.2 dB)
    c = config_for_bitrate(500.0)
    assert (c.chunk_seconds, c.quantize) == (0.1, None)
    # 240 bps -> the fp16 hi-fi point (80.0 dB @ 230.6)
    c = config_for_bitrate(240.0)
    assert (c.chunk_seconds, c.quantize) == (0.1, "float16")
    # unlimited -> the ultra point pins its calibrated patience
    c = config_for_bitrate(1000.0)
    assert (c.chunk_seconds, c.quantize, c.plateau_patience) == (
        0.05, None, 75)
    # base knobs survive
    base = CodecConfig(fused=True, seed=7, max_chunks_per_batch=16)
    c = config_for_bitrate(4.5, base=base)
    assert c.fused and c.seed == 7 and c.max_chunks_per_batch == 16
    # monotone: bigger budget never picks a lower-rate point
    budgets = [1, 2.2, 2.7, 3.2, 5, 9, 60, 120, 300]
    widths = [config_for_bitrate(b).hidden_features for b in budgets]
    rates = [(config_for_bitrate(b).chunk_seconds,
              config_for_bitrate(b).hidden_features) for b in budgets]
    assert rates == sorted(rates, key=lambda t: (-t[0], t[1])), (widths, rates)


@pytest.mark.slow
def test_modulated_encode_decode(tmp_path):
    """Shared-backbone codec: one network + per-chunk modulations.  The
    payload must reconstruct the clip, cost far fewer bytes per chunk than
    the per-chunk codec, survive a file round trip (incl. int8 mods), and
    support range decode."""
    from inraudio_tpu.codec import (ModulatedCodecConfig, decode_range,
                                    encode_modulated)

    sig = _sig(0.6)
    cfg = ModulatedCodecConfig(chunk_seconds=0.1, hidden_features=32,
                               first_omega_0=200.0, total_steps=500,
                               learning_rate=2e-3, quantize_mods=None,
                               shared_fp16=False)
    payload = encode_modulated(sig, FS, cfg)
    assert payload["meta"]["codec"] == "modulated"
    assert payload["params"]["mods"].shape[1] == payload["meta"]["mod_dim"]
    fs, rec = decode(payload)
    assert fs == FS and len(rec) == len(sig)
    snr = 10 * np.log10(np.sum(sig ** 2) / np.sum((sig - rec) ** 2))
    assert snr > 20, snr

    # per-chunk marginal cost is the modulation vector, not a param set
    per_chunk_cost = (payload["params"]["mods"].nbytes
                      / payload["meta"]["num_chunks"])
    from inraudio_tpu.models import param_bytes
    full_model_cost = param_bytes(payload["params"]["shared"])
    assert per_chunk_cost < full_model_cost / 10

    # range decode consistent with the full decode
    a, b = int(round(0.15 * FS)), int(round(0.45 * FS))
    _, part = decode_range(payload, 0.15, 0.45)
    np.testing.assert_allclose(part, rec[a:b], rtol=0, atol=1e-6)

    # int8 modulation file round trip
    cfg8 = ModulatedCodecConfig(**{**cfg.__dict__, "quantize_mods": "int8",
                                   "shared_fp16": True})
    p8 = encode_modulated(sig, FS, cfg8)
    # per-COLUMN mod scales (probe_mod_quant.py): one scale per feature
    assert p8["params"]["mods"]["scale"].shape == (
        1, p8["meta"]["mod_dim"])
    path = save_inr(str(tmp_path / "m.inr"), p8)
    loaded = load_inr(path)
    _, rec8a = decode(loaded)
    _, rec8b = decode(p8)
    np.testing.assert_allclose(rec8a, rec8b, atol=1e-6)
    snr8 = 10 * np.log10(np.sum(sig ** 2) / np.sum((sig - rec8a) ** 2))
    assert snr8 > 15, snr8

    # int16: fp16's bytes as 16 uniform bits — the hi-fi mod tier.  Same
    # fit, so it must sit at or above int8 and survive the container.
    cfg16 = ModulatedCodecConfig(**{**cfg.__dict__,
                                    "quantize_mods": "int16",
                                    "shared_fp16": True})
    p16 = encode_modulated(sig, FS, cfg16)
    assert p16["params"]["mods"]["q"].dtype == np.int16
    loaded16 = load_inr(save_inr(str(tmp_path / "m16.inr"), p16))
    _, rec16 = decode(loaded16)
    snr16 = 10 * np.log10(np.sum(sig ** 2) / np.sum((sig - rec16) ** 2))
    assert snr16 >= snr8 - 0.1, (snr16, snr8)


def test_empty_signal_rejected():
    from inraudio_tpu.codec import ModulatedCodecConfig, encode_modulated
    with pytest.raises(ValueError, match="empty"):
        encode(np.zeros((0,), np.float32), FS, SMALL)
    with pytest.raises(ValueError, match="empty"):
        encode(np.zeros((100, 0), np.float32), FS, SMALL)  # zero channels
    with pytest.raises(ValueError, match="empty"):
        encode_modulated(np.zeros((0, 2), np.float32), FS,
                         ModulatedCodecConfig(total_steps=5))
    # bad modulation quantizer fails BEFORE the (expensive) fit
    with pytest.raises(ValueError, match="quantize_mods"):
        encode_modulated(_sig(0.1), FS,
                         ModulatedCodecConfig(total_steps=5,
                                              quantize_mods="int4"))


def test_cli_modulated_flag_conflicts(capsys):
    from inraudio_tpu.__main__ import main
    for argv in (["encode", "--input", "x.wav", "--output", "y",
                  "--modulated", "--target-bps", "4.5"],
                 ["encode", "--input", "x.wav", "--output", "y",
                  "--modulated", "--quantize", "int4"],
                 ["encode", "--input", "x.wav", "--output", "y",
                  "--modulated", "--quantize", "none",
                  "--refit-steps", "100"],
                 ["encode", "--input", "x.wav", "--output", "y",
                  "--film-scale"],
                 ["encode", "--input", "x.wav", "--output", "y",
                  "--segment-s", "1.0"],
                 ["encode", "--input", "x.wav", "--output", "y",
                  "--mods-lr-mult", "5"]):
        with pytest.raises(SystemExit):
            main(argv)


def test_modulated_film_scale_roundtrip(tmp_path):
    """film_scale doubles mod_dim (per-unit gains + shifts), zero mods are
    identity, and the payload round-trips through a file."""
    from inraudio_tpu.codec import ModulatedCodecConfig, encode_modulated
    from inraudio_tpu.models.modulated import (mod_dim, modulated_apply,
                                               modulated_init)
    from inraudio_tpu.models.siren import SirenSnakeTanhConfig
    import jax

    cfg = SirenSnakeTanhConfig(hidden_features=16, num_sine=1, num_snake=1,
                               first_omega_0=100.0)
    assert mod_dim(cfg, film_scale=True) == 2 * mod_dim(cfg)
    p = modulated_init(jax.random.PRNGKey(0), cfg, 3, film_scale=True)
    coords = np.linspace(-1, 1, 50, dtype=np.float32)[:, None]
    out0 = modulated_apply(p["shared"], cfg, coords, p["mods"][0],
                           film_scale=True)
    out_plain = modulated_apply(p["shared"], cfg, coords,
                                np.zeros(mod_dim(cfg), np.float32))
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out_plain),
                               atol=1e-6)

    sig = _sig(0.3)
    payload = encode_modulated(sig, FS, ModulatedCodecConfig(
        chunk_seconds=0.1, hidden_features=24, first_omega_0=200.0,
        total_steps=200, film_scale=True, quantize_mods="int8"))
    assert payload["meta"]["film_scale"] is True
    path = save_inr(str(tmp_path / "f.inr"), payload)
    _, rec_a = decode(load_inr(path))
    _, rec_b = decode(payload)
    np.testing.assert_allclose(rec_a, rec_b, atol=1e-6)


def test_modulated_decode_upsample():
    """BWE decode works for modulated payloads: the u-grid subdivides the
    training grid, so every u-th sample matches the 1x decode closely."""
    from inraudio_tpu.codec import ModulatedCodecConfig, encode_modulated
    sig = _sig(0.3)
    payload = encode_modulated(sig, FS, ModulatedCodecConfig(
        chunk_seconds=0.1, hidden_features=24, first_omega_0=200.0,
        total_steps=200, quantize_mods=None, shared_fp16=False))
    fs2, rec2 = decode(payload, upsample=2)
    fs1, rec1 = decode(payload)
    assert fs2 == 2 * fs1 and len(rec2) == 2 * len(rec1)
    err = rec2[::2] - rec1
    snr = 10 * np.log10(np.sum(rec1 ** 2) / (np.sum(err ** 2) + 1e-20))
    assert snr > 30, snr


@pytest.mark.slow
def test_modulated_stereo(tmp_path):
    """Multichannel modulated payloads: channel-major modulation rows,
    (n, 2) decode, range decode consistent."""
    from inraudio_tpu.codec import (ModulatedCodecConfig, decode_range,
                                    encode_modulated)
    sig = np.stack([_sig(0.3, 220.0), _sig(0.3, 347.0)], axis=1)
    payload = encode_modulated(sig, FS, ModulatedCodecConfig(
        chunk_seconds=0.1, hidden_features=32, first_omega_0=200.0,
        total_steps=500, learning_rate=2e-3, quantize_mods="int8"))
    assert payload["meta"]["num_channels"] == 2
    k = payload["meta"]["num_chunks"]
    assert payload["params"]["mods"]["q"].shape[0] == 2 * k
    fs, rec = decode(payload)
    assert rec.shape == sig.shape
    a, b = int(round(0.05 * FS)), int(round(0.2 * FS))
    _, part = decode_range(payload, 0.05, 0.2)
    np.testing.assert_allclose(part, rec[a:b], rtol=0, atol=1e-6)


def test_decode_stream_blocks_equal_full(small_payload):
    """Streaming decode: concatenated blocks equal the full decode (both
    per-chunk and modulated payloads), block boundaries are exact."""
    from inraudio_tpu.codec import (ModulatedCodecConfig, decode_stream,
                                    encode_modulated)
    sig, p1 = small_payload          # 0.5 s
    _, full1 = decode(p1)
    blocks = list(decode_stream(p1, block_s=0.13))
    assert blocks[0][0] == 0 and len(blocks) == 4
    np.testing.assert_allclose(np.concatenate([b for _, b in blocks]),
                               full1, rtol=0, atol=1e-6)

    p2 = encode_modulated(sig, FS, ModulatedCodecConfig(
        chunk_seconds=0.1, hidden_features=24, first_omega_0=200.0,
        total_steps=150, quantize_mods=None, shared_fp16=False))
    _, full2 = decode(p2)
    np.testing.assert_allclose(
        np.concatenate([b for _, b in decode_stream(p2, block_s=0.2)]),
        full2, rtol=0, atol=1e-6)


@pytest.mark.slow
def test_modulated_segmented_backbones(tmp_path):
    """segment_s: one backbone per segment on a GLOBAL chunk grid.  On a
    clip whose content changes halfway, two segment backbones beat one
    whole-clip backbone at equal steps; file round trip, range decode and
    streaming all work on the stacked-backbone payload."""
    from inraudio_tpu.codec import (ModulatedCodecConfig, decode_range,
                                    decode_stream, encode_modulated)

    # 0.6 s: 220 Hz then 900 Hz — a capacity stress for one tiny backbone
    t1 = np.arange(int(0.3 * FS)) / FS
    sig = np.concatenate([0.7 * np.sin(2 * np.pi * 220 * t1),
                          0.7 * np.sin(2 * np.pi * 900 * t1)]).astype(
        np.float32)
    base = dict(chunk_seconds=0.1, hidden_features=20, first_omega_0=200.0,
                total_steps=500, learning_rate=2e-3, quantize_mods=None,
                shared_fp16=False)
    p1 = encode_modulated(sig, FS, ModulatedCodecConfig(**base))
    p2 = encode_modulated(sig, FS, ModulatedCodecConfig(
        **base, segment_s=0.3))
    assert p1["meta"]["num_segments"] == 1
    assert p2["meta"]["num_segments"] == 2
    assert len(p2["meta"]["segment_bounds"]) == 3

    def snr(p):
        _, rec = decode(p)
        return 10 * np.log10(np.sum(sig ** 2) / np.sum((sig - rec) ** 2))

    s1, s2 = snr(p1), snr(p2)
    assert s2 > s1 + 3.0, (s1, s2)   # split capacity wins clearly

    # file round trip (stacked backbone leaves)
    path = save_inr(str(tmp_path / "seg.inr"), p2)
    _, rec_a = decode(load_inr(path))
    _, rec_b = decode(p2)
    np.testing.assert_allclose(rec_a, rec_b, atol=1e-6)

    # random access + streaming across the segment boundary
    a, b = int(round(0.2 * FS)), int(round(0.4 * FS))
    _, part = decode_range(p2, 0.2, 0.4)
    np.testing.assert_allclose(part, rec_b[a:b], rtol=0, atol=1e-6)
    np.testing.assert_allclose(
        np.concatenate([blk for _, blk in decode_stream(p2, block_s=0.25)]),
        rec_b, rtol=0, atol=1e-6)


@pytest.mark.slow
def test_modulated_backbone_refit_recovers_quantization_loss(tmp_path):
    """Quantization-aware BACKBONE refit (frozen dequantized mods): must
    recover a measurable part of the int8 modulation-quantization loss."""
    from inraudio_tpu.codec import ModulatedCodecConfig, encode_modulated

    sig = _sig(0.4)
    base = dict(chunk_seconds=0.1, hidden_features=24, first_omega_0=200.0,
                total_steps=500, learning_rate=2e-3, quantize_mods="int8",
                shared_fp16=False, mods_lr_mult=5.0)
    p0 = encode_modulated(sig, FS, ModulatedCodecConfig(**base))
    p1 = encode_modulated(sig, FS, ModulatedCodecConfig(
        **base, refit_backbone_steps=300))

    def snr(p):
        _, rec = decode(p)
        return 10 * np.log10(np.sum(sig ** 2) / np.sum((sig - rec) ** 2))

    s0, s1 = snr(p0), snr(p1)
    assert s1 > s0 + 1.0, (s0, s1)
    # refit payload still round-trips through a file
    path = save_inr(str(tmp_path / "rb.inr"), p1)
    _, rec_a = decode(load_inr(path))
    _, rec_b = decode(p1)
    np.testing.assert_allclose(rec_a, rec_b, atol=1e-6)


def test_modulated_config_validation():
    from inraudio_tpu.codec import ModulatedCodecConfig, encode_modulated
    with pytest.raises(ValueError, match="segment_s"):
        encode_modulated(_sig(0.2), FS,
                         ModulatedCodecConfig(total_steps=5, segment_s=0.0))
    with pytest.raises(ValueError, match="refit_backbone_steps"):
        encode_modulated(_sig(0.2), FS,
                         ModulatedCodecConfig(total_steps=5,
                                              quantize_mods=None,
                                              refit_backbone_steps=10))
    from inraudio_tpu.train.modulated import modulated_fit
    from inraudio_tpu.models.siren import SirenSnakeTanhConfig
    from inraudio_tpu.train import TrainConfig
    import numpy as np
    cfg = SirenSnakeTanhConfig(hidden_features=8, num_sine=1, num_snake=0,
                               first_omega_0=30.0)
    t = np.zeros((2, 16, 1), np.float32)
    co = np.linspace(-1, 1, 16, dtype=np.float32)[:, None]
    base = modulated_fit(cfg, t, co, TrainConfig(total_steps=2))
    with pytest.raises(ValueError, match="init_shared"):
        modulated_fit(cfg, t, co, TrainConfig(total_steps=2),
                      frozen_shared=base.shared, init_shared=base.shared)


def test_auto_mod_tier_rule():
    """'auto' = the measured switch: fp16 mods below the ~70 dB fit-SNR
    handover (fp16's cap is ~76 dB and it entropy-codes smaller), int16
    above it.  Aggregation is chunk-count-weighted across segments."""
    from inraudio_tpu.codec import _auto_mod_tier
    # fit SNR = 10*log10(0.1 / 1e-4) = 30 dB -> float16
    assert _auto_mod_tier([1e-4], [0.1], [10]) == "float16"
    # 10*log10(0.1 / 1e-9) = 80 dB -> int16
    assert _auto_mod_tier([1e-9], [0.1], [10]) == "int16"
    # weighting is MSE-additive: one bad segment caps the aggregate no
    # matter how small it is (overall SNR is what the cap acts on)...
    assert _auto_mod_tier([1e-4, 1e-9], [0.1, 0.1], [100, 1]) == "float16"
    assert _auto_mod_tier([1e-4, 1e-9], [0.1, 0.1], [1, 1000]) == "float16"
    # ...and a mildly-worse small segment cannot drag a hi-fi clip down
    assert _auto_mod_tier([1e-6, 1e-9], [0.1, 0.1], [1, 1000]) == "int16"


def test_modulated_auto_tier_e2e():
    """A short (fit-limited, well under 70 dB) auto encode resolves to
    fp16 mods and records the RESOLVED tier in the payload header."""
    from inraudio_tpu.codec import ModulatedCodecConfig, encode_modulated
    sig = _sig(0.2)
    p = encode_modulated(sig, FS, ModulatedCodecConfig(
        chunk_seconds=0.1, hidden_features=16, first_omega_0=100.0,
        total_steps=60, quantize_mods="auto"))
    assert p["meta"]["quantize"] == "float16"
    assert p["params"]["mods"].dtype == np.float16
    _, rec = decode(p)
    assert len(rec) == len(sig)


# ---- INRA container + side-leaf quantization (r3) ----------------------

def test_inra_container_bitexact_and_no_larger(tmp_path, int8_payload):
    """INRA (per-leaf best-of entropy coding) round-trips every leaf
    bit-exactly and never beats npz at its own game by being larger."""
    _, payload = int8_payload
    p_npz = save_inr(str(tmp_path / "x.npz"), payload)
    p_inra = save_inr(str(tmp_path / "x"), payload)
    assert p_inra.endswith(".inra")
    import jax
    a = jax.tree_util.tree_flatten(load_inr(p_npz)["params"])[0]
    b = jax.tree_util.tree_flatten(load_inr(p_inra)["params"])[0]
    assert len(a) == len(b)
    for la, lb in zip(a, b):
        assert np.asarray(la).dtype == np.asarray(lb).dtype
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    assert os.path.getsize(p_inra) <= os.path.getsize(p_npz)


def test_inra_detects_container_by_magic_not_extension(tmp_path,
                                                       small_payload):
    _, payload = small_payload
    # an .npz written under a neutral name still loads (magic sniffing)
    p = save_inr(str(tmp_path / "odd.npz"), payload)
    os.rename(p, str(tmp_path / "renamed.bin"))
    _, rec = decode(load_inr(str(tmp_path / "renamed.bin")))
    _, rec0 = decode(payload)
    np.testing.assert_array_equal(rec, rec0)


def test_sideless_legacy_payload_loads(tmp_path):
    """Payloads written with side_quantize=False (the pre-r3 layout,
    meta side_quantized False/absent) keep loading and decoding."""
    sig = _sig(0.3)
    cfg = CodecConfig(**{**SMALL.__dict__, "quantize": "int8",
                         "side_quantize": False, "total_steps": 40})
    payload = encode(sig, FS, cfg)
    assert payload["meta"]["side_quantized"] is False
    # simulate a pre-r3 header with the key absent entirely
    del payload["meta"]["side_quantized"]
    for name in ("l.npz", "l"):
        path = save_inr(str(tmp_path / name), payload)
        _, rec = decode(load_inr(path))
        _, rec0 = decode(payload)
        np.testing.assert_array_equal(rec, rec0)


def test_side_quantization_structure_and_cost():
    """Layer 0 stays float32 end to end; layers-1+ sides take the
    conservative tier; dequantized sides stay close to the originals."""
    from inraudio_tpu.codec import dequantize_inr_params, quantize_inr_params
    from inraudio_tpu.models import SirenSnakeTanhConfig, build_model
    import jax
    model = build_model("mlp", SirenSnakeTanhConfig(
        hidden_features=16, num_sine=1, num_snake=1, first_omega_0=100.0))
    params = jax.vmap(model.init)(jax.random.split(jax.random.PRNGKey(0), 3))
    for mode in ("float16", "int8", "int4"):
        q = quantize_inr_params(params, mode)
        l0 = q["layers"][0]
        assert np.asarray(l0["w"]).dtype == np.float32
        assert np.asarray(l0["b"]).dtype == np.float32
        for layer in q["layers"][1:]:
            assert np.asarray(layer["b"]).dtype == np.float16
        dq = dequantize_inr_params(q)
        for li in range(1, len(params["layers"])):
            orig = np.asarray(params["layers"][li]["b"])
            got = np.asarray(dq["layers"][li]["b"])
            peak = np.max(np.abs(orig))
            assert np.max(np.abs(orig - got)) <= peak / 64, (mode, li)


@pytest.mark.slow
def test_side_quantization_snr_parity():
    """side_quantize=True (fp16 sides) costs (sub-)tenth-dB SNR at every
    measured operating point (15/19/28/44 dB) while cutting the
    payload."""
    sig = _sig(0.4)
    base = CodecConfig(**{**SMALL.__dict__, "quantize": "int8",
                          "total_steps": 300})
    p_on = encode(sig, FS, base)
    p_off = encode(sig, FS, CodecConfig(
        **{**base.__dict__, "side_quantize": False}))
    _, r_on = decode(p_on)
    _, r_off = decode(p_off)

    def snr(r):
        return 10 * np.log10(np.sum(sig[:len(r)] ** 2)
                             / np.sum((sig[:len(r)] - r) ** 2))
    assert snr(r_on) > snr(r_off) - 0.2, (snr(r_on), snr(r_off))
    s_on = compression_stats(p_on)["bits_per_sample"]
    s_off = compression_stats(p_off)["bits_per_sample"]
    assert s_on < s_off, (s_on, s_off)


def test_payload_info_both_containers(tmp_path, int8_payload):
    """`info` inspects a payload without decoding: container kind, codec
    meta, per-leaf storage table, and file-level bits/sample that match
    compression_stats."""
    from inraudio_tpu.codec import payload_info
    _, payload = int8_payload
    for name in ("x", "x.npz"):
        path = save_inr(str(tmp_path / name), payload)
        rec = payload_info(path)
        assert rec["container"] == ("npz" if name.endswith("npz") else "inra")
        assert rec["meta"]["quantize"] == "int8"
        assert rec["file_bytes"] == os.path.getsize(path)
        stats = compression_stats(payload, path=path)
        assert rec["bits_per_sample"] == pytest.approx(
            stats["file_bits_per_sample"])
        # the leaf table covers every stored array exactly once and the
        # stored blobs account for (almost all of) the file
        names = [e["name"] for e in rec["leaves"]]
        assert names[0] == "scales" and len(set(names)) == len(names)
        assert 0 < rec["stored_leaf_bytes"] <= rec["file_bytes"]
    # the pre-suffix path the user passed to encode --output resolves too
    rec = payload_info(str(tmp_path / "x"))
    assert rec["container"] == "inra"
    assert load_inr(str(tmp_path / "x"))["meta"]["quantize"] == "int8"


def test_cli_info(tmp_path, capsys, small_payload):
    from inraudio_tpu.__main__ import main
    from inraudio_tpu.codec import save_inr as _save
    _, payload = small_payload
    path = _save(str(tmp_path / "p"), payload)
    assert main(["info", "--input", path, "--json"]) == 0
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["container"] == "inra"
    assert rec["meta"]["model"]["hidden_features"] == 32
    assert main(["info", "--input", path]) == 0
    out = capsys.readouterr().out
    assert "INRA container" in out and "bits/sample" in out


def test_estimate_modulated_bps_exact():
    """The analytic estimator must reproduce a real payload's in-memory
    bits/sample EXACTLY — it mirrors the layout (mods + per-column scales
    + stored backbones + chunk scales), so any drift means the payload
    format moved without the planner."""
    from inraudio_tpu.codec import (ModulatedCodecConfig, compression_stats,
                                    encode_modulated, estimate_modulated_bps)

    sig = _sig(0.6)
    for quant, seg in ((None, None), ("float16", None), ("int8", None),
                       ("int16", 0.25)):
        cfg = ModulatedCodecConfig(chunk_seconds=0.1, hidden_features=32,
                                   first_omega_0=200.0, total_steps=10,
                                   quantize_mods=quant, segment_s=seg)
        payload = encode_modulated(sig, FS, cfg)
        st = compression_stats(payload)
        est = estimate_modulated_bps(cfg, len(sig), FS)
        assert abs(est - st["bits_per_sample"]) < 1e-9, (
            quant, seg, est, st["bits_per_sample"])


def test_plan_for_bitrate_selects_modulated_when_calibrated():
    """Cross-family planning: a calibrated modulated point that fits the
    budget at higher SNR must win over the per-chunk table; uncalibrated
    (snr None) entries are never selected; per-chunk wins when nothing
    modulated fits."""
    from inraudio_tpu.codec import (CodecConfig, ModulatedCodecConfig,
                                    estimate_modulated_bps, plan_for_bitrate)

    n, fs = 7 * 44100, 44100
    knobs = dict(chunk_seconds=0.05, hidden_features=64,
                 quantize_mods="int8")
    est = 0.93 * estimate_modulated_bps(
        ModulatedCodecConfig(**knobs), n, fs)
    # calibrated at an SNR above every per-chunk point that fits est
    pts = (("m", 90.0, knobs),)
    kind, cfg = plan_for_bitrate(est * 1.2, n, fs, _mod_points=pts)
    assert kind == "modulated" and isinstance(cfg, ModulatedCodecConfig)
    assert cfg.hidden_features == 64

    # same point uncalibrated -> per-chunk fallback
    kind, cfg = plan_for_bitrate(est * 1.2, n, fs,
                                 _mod_points=(("m", None, knobs),))
    assert kind == "per_chunk" and isinstance(cfg, CodecConfig)

    # budget below the modulated estimate -> per-chunk point (pricier
    # modulated candidate: fp16 mods at h=128 is ~5.6 bps on this clip)
    pricey = (("m", 90.0, dict(chunk_seconds=0.05, hidden_features=128,
                               quantize_mods="float16")),)
    kind, cfg = plan_for_bitrate(2.2, n, fs, _mod_points=pricey)
    assert kind == "per_chunk" and cfg.hidden_features == 32

    # base knobs survive planning
    base = CodecConfig(fused=True, seed=3)
    kind, cfg = plan_for_bitrate(2.2, n, fs, base=base, _mod_points=pricey)
    assert cfg.fused and cfg.seed == 3


def test_plan_for_bitrate_default_table_mid_rate_is_modulated():
    """With the r4 TPU calibrations stamped into _MOD_RD_POINTS, the
    DEFAULT tables must route a mid-rate target on a 7 s 44.1 kHz clip to
    the segmented-int16 modulated codec: at ~26-50 bps the calibrated
    mod_seg1_h128_i16 point (39.7 dB @ ~25.7 bps) dominates the best
    fitting per-chunk point (fp16 h48, 32.1 dB @ 6.91 bps); by 90+ bps the
    per-chunk fp16 h128 point (56.7 dB) takes over again."""
    from inraudio_tpu.codec import ModulatedCodecConfig, plan_for_bitrate

    n, fs = 308207, 44100  # gt_bach.wav shape, the calibration clip
    kind, cfg = plan_for_bitrate(30.0, n, fs)
    assert kind == "modulated" and isinstance(cfg, ModulatedCodecConfig)
    assert cfg.hidden_features == 128 and cfg.segment_s == 1.0
    assert cfg.quantize_mods == "int16"

    kind, _cfg = plan_for_bitrate(120.0, n, fs)
    assert kind == "per_chunk"

    # ultra-low rate: below the per-chunk frontier's 1.88 bps floor the
    # whole-clip-backbone int8 point (15.4 dB @ ~1.4 bps) is the only
    # candidate that fits
    kind, cfg = plan_for_bitrate(1.5, n, fs)
    assert kind == "modulated" and cfg.hidden_features == 48
    assert cfg.refit_backbone_steps == 400


def test_plan_for_bitrate_minute_scale():
    """r5 minute-scale calibration (bench_logs_r5/03+04): at 60 s the
    whole-clip-backbone points amortise below the per-chunk 1.88 bps floor
    (h64: 16.77 dB @ ~1.3 disk bps measured) and still own the ultra-low
    end, while the mid rates belong to per-chunk (seg5 modulated measured
    ~10 dB under per-chunk at equal bps: capacity per content-second)."""
    from inraudio_tpu.codec import ModulatedCodecConfig, plan_for_bitrate

    n, fs = 60 * 44100, 44100
    # ultra-low: only the amortised whole-clip modulated points fit
    kind, cfg = plan_for_bitrate(1.5, n, fs)
    assert kind == "modulated" and isinstance(cfg, ModulatedCodecConfig)
    assert cfg.segment_s is None and cfg.hidden_features == 64

    # mid rate at minute scale: per-chunk dominates (the 0.5 s h48 fp16
    # point at 6.91 bps / 32.1 dB beats every measured modulated option)
    kind, cfg = plan_for_bitrate(8.0, n, fs)
    assert kind == "per_chunk"
    assert cfg.hidden_features == 48 and cfg.quantize == "float16"


def test_meta_trained_forward_and_fit_snr(small_payload):
    """r4: the header records the training forward semantics and an
    estimated fit SNR (from per-chunk best losses) so decode can route
    and quality-gate without touching the audio."""
    sig, payload = small_payload
    meta = payload["meta"]
    assert meta["trained_forward"] == "exact"  # CPU fixture: fused=False
    est = meta["fit_snr_db"]
    fs, rec = decode(payload, fused=False)
    actual = 10 * np.log10(np.sum(sig ** 2) / np.sum((sig - rec) ** 2))
    # the estimator ignores crossfade stitching; a few dB of slack
    assert abs(est - actual) < 6.0, (est, actual)


def test_decode_auto_matches_forced_xla_on_cpu(small_payload):
    """fused=None (auto) on a CPU backend must take the XLA path —
    bit-identical to decode(fused=False) — for exact-trained AND for
    (hypothetically) fused-trained payloads, since there is no chip."""
    sig, payload = small_payload
    _, a = decode(payload, fused=None)
    _, b = decode(payload, fused=False)
    np.testing.assert_array_equal(a, b)
    fake = {**payload, "meta": {**payload["meta"],
                                "trained_forward": "fused_approx"}}
    _, c = decode(fake, fused=None)
    np.testing.assert_array_equal(c, b)


def test_legacy_payload_without_routing_keys_decodes(small_payload):
    """Pre-r4 payloads have neither trained_forward nor fit_snr_db: auto
    routing must fall back to the XLA apply."""
    sig, payload = small_payload
    meta = {k: v for k, v in payload["meta"].items()
            if k not in ("trained_forward", "fit_snr_db")}
    legacy = {**payload, "meta": meta}
    _, rec = decode(legacy)
    snr = 10 * np.log10(np.sum(sig ** 2) / np.sum((sig - rec) ** 2))
    assert snr > 25, snr


def test_decode_many_matches_individual_decodes(small_payload, int8_payload):
    """Batched serving decode: compatible payloads share one dispatch
    (their chunk populations concatenate), incompatible ones group apart —
    the results must equal per-payload decode() in input order."""
    sig_a, pay_a = small_payload
    sig_b, pay_b = int8_payload
    # a third payload whose chunk grid differs -> its own compile group
    sig_c = _sig(0.25, f=330.0)
    cfg_c = CodecConfig(**{**SMALL.__dict__, "chunk_seconds": 0.05,
                           "total_steps": 60})
    pay_c = encode(sig_c, FS, cfg_c)
    batched = decode_many([pay_a, pay_b, pay_c])
    singles = [decode(pay_a), decode(pay_b), decode(pay_c)]
    for (fs_m, rec_m), (fs_1, rec_1) in zip(batched, singles):
        assert fs_m == fs_1
        np.testing.assert_allclose(rec_m, rec_1, atol=1e-6)


def test_decode_device_param_cache(int8_payload):
    """decode/decode_range stash the dequantized DEVICE params in the
    payload after the first call (a seek-heavy serving pattern would
    otherwise re-dequantize and re-upload the whole parameter set for
    every O(range) seek); the cache is keyed on the exact ``params``
    object and rebuilds when that object is replaced."""
    import jax

    from inraudio_tpu.codec import (_DEVICE_CACHE_KEY, _EVAL_CACHE_KEY,
                                    decode_range)

    sig, payload = int8_payload
    payload = dict(payload)  # keep the shared fixture's dict untouched
    payload.pop(_DEVICE_CACHE_KEY, None)
    payload.pop(_EVAL_CACHE_KEY, None)
    fs1, rec1 = decode(payload)
    assert _DEVICE_CACHE_KEY in payload
    cached = payload[_DEVICE_CACHE_KEY]
    fns = dict(payload[_EVAL_CACHE_KEY][1])
    assert len(fns) == 1
    fs2, rec2 = decode(payload)
    assert payload[_DEVICE_CACHE_KEY] is cached  # reused, not rebuilt
    assert payload[_EVAL_CACHE_KEY][1] == fns    # jitted eval reused too
    assert fs1 == fs2
    np.testing.assert_array_equal(rec1, rec2)
    # a range decode rides the same caches and matches the full decode
    _, sl = decode_range(payload, 0.05, 0.1)
    assert payload[_DEVICE_CACHE_KEY] is cached
    assert payload[_EVAL_CACHE_KEY][1] == fns    # same key: tier + grid
    a, b = int(round(0.05 * fs1)), int(round(0.1 * fs1))
    np.testing.assert_allclose(sl, rec1[a:b], atol=1e-5)
    # replacing the params object invalidates both caches
    payload["params"] = jax.tree.map(lambda x: x, payload["params"])
    decode(payload)
    assert payload[_DEVICE_CACHE_KEY] is not cached
    assert payload[_EVAL_CACHE_KEY][0] is payload["params"]


def test_cli_decode_many(tmp_path, small_payload, int8_payload):
    """`decode --input a b --output x y` routes through decode_many and
    writes one wav per payload, identical to two single decodes."""
    from inraudio_tpu.__main__ import main
    from inraudio_tpu.data.audio_io import read_wav
    _, pay_a = small_payload
    _, pay_b = int8_payload
    pa = save_inr(str(tmp_path / "a.inr"), pay_a)
    pb = save_inr(str(tmp_path / "b.inr"), pay_b)
    oa, ob = str(tmp_path / "a.wav"), str(tmp_path / "b.wav")
    assert main(["decode", "--input", pa, pb, "--output", oa, ob]) == 0
    for out, pay in ((oa, pay_a), (ob, pay_b)):
        fs, rec = read_wav(out)
        fs1, rec1 = decode(pay)
        assert fs == fs1
        np.testing.assert_allclose(rec, rec1, atol=2e-5)
