"""inraudio_tpu — a TPU-native (JAX/XLA/Pallas) framework for fitting implicit
neural representations (INRs) to audio.

Re-designed from scratch for TPU with the capability surface of
``senyuanfan/inr-for-audio`` (the reference lives at /root/reference and is
cited by file:line throughout this package):

- ``dsp``      — MDCT/ISTMDCT, windows, filters, STFT, SNR (reference mdct.py,
                 window.py, utils.py:25-97), implemented as XLA-compiled jnp.
- ``data``     — coordinate grids + fitting-problem builders (reference
                 utils.py:99-414).
- ``models``   — SIREN family, Snake, encodings, KAN, ReLU MLP (reference
                 models.py, kan.py) as functional pytree init/apply pairs.
- ``ops``      — Pallas TPU kernels for the hot paths (fused sine-MLP).
- ``train``    — loss zoo, Adam + ReduceLROnPlateau as carried state, jitted
                 scan training loop (reference run.py:30-400).
- ``parallel`` — jax.sharding mesh utilities: coordinate-axis data parallelism
                 and optional tensor parallelism over hidden features.
- ``eval``     — dense decode (incl. bandwidth extension), metrics, plots
                 (reference run.py:249-354).
- ``experiments`` — runner with the reference ``train(...)`` kwarg surface
                 (reference run.py:30, run_experimental.py:30).
"""

__version__ = "0.1.0"
