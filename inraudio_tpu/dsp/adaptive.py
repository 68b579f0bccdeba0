"""Adaptive STMDCT with block switching (long/short/transition windows).

The reference DRAFTS the block-switching window quartet but leaves it
commented out (window.py:67-113) and its MDCT already takes separate
half-lengths ``(a, b)`` (mdct.py:16-42) — the variable-block form.  This
module wires the capability end to end:

- a transient detector over the short-hop energy envelope picks which long
  slots switch to short blocks (pre-echo control, the entire point of block
  switching in AAC/MP3);
- a host-side PLAN maps the signal to a frame sequence
  ``long ... long, start, 8 x short ... , stop, long ...`` where a flagged
  pair of long slots is replaced by ``start + 7 shorts + stop`` — exactly
  critically sampled (576 + 7*128 + 576 = 2048 coefficients for
  n_long=2048/n_short=256, the same as the two long frames it replaces);
- the transforms run batched PER KIND: all long frames are one
  (num, n_long) x (n_long, n_long/2) MXU matmul, all shorts another — the
  plan only changes gather/scatter indices, never the jitted shapes' rank.

TDAC across a switch: every overlap region pairs the rising and falling
halves of the SAME power-complementary mother window (KBD-KBD at long
boundaries, sine-sine at short boundaries — the transition windows are
spliced from those halves, window.py:89-113), and each frame's MDCT uses
its true half-lengths ``(a, b)`` with ``n0 = (b+1)/2``, so aliasing cancels
and reconstruction is perfect.  Verified to ~1e-6 by
tests/test_adaptive.py on a click train across a long->short->long switch.

Frame geometry: frame i with halves (a_i, b_i) starts at
``offset_{i+1} = offset_i + a_i`` and requires ``a_{i+1} == b_i``.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from .mdct import imdct, mdct
from .windows import (long_window, short_window, transition_start_window,
                      transition_stop_window)

KINDS = ("long", "start", "short", "stop")


@dataclasses.dataclass(frozen=True)
class AdaptivePlan:
    """Host-side frame plan: per frame its kind and start offset."""

    n_long: int
    n_short: int
    kinds: tuple[str, ...]
    offsets: tuple[int, ...]
    num_samples: int

    def halves(self, kind: str) -> tuple[int, int]:
        nl2, ns2 = self.n_long // 2, self.n_short // 2
        return {"long": (nl2, nl2), "start": (nl2, ns2),
                "short": (ns2, ns2), "stop": (ns2, nl2)}[kind]

    def window(self, kind: str) -> np.ndarray:
        return {"long": long_window(self.n_long),
                "start": transition_start_window(self.n_long, self.n_short),
                "short": short_window(self.n_short),
                "stop": transition_stop_window(self.n_long, self.n_short),
                }[kind]

    @property
    def total_coeffs(self) -> int:
        return sum(sum(self.halves(k)) // 2 for k in self.kinds)


def _validate_sizes(n_long: int, n_short: int) -> None:
    """The long/short grids must nest: the switch group advances exactly
    two long hops only when n_short divides n_long (and both are even).
    A non-dividing pair would not crash plan_blocks — it would silently
    break the a_{i+1} == b_i frame chain and leave uncancelled aliasing
    in the reconstruction."""
    if n_long % 2 or n_short % 2:
        raise ValueError(f"n_long and n_short must be even, got "
                         f"{n_long}/{n_short}")
    if n_short <= 0 or n_long % n_short:
        raise ValueError(
            f"n_short must divide n_long for critical sampling across a "
            f"window switch, got n_long={n_long}, n_short={n_short}")


def detect_transients(data: np.ndarray, n_long: int = 2048,
                      n_short: int = 256, threshold: float = 8.0
                      ) -> np.ndarray:
    """Flag long-hop slots containing an energy transient.

    Short-hop energy envelope; a slot is transient when its peak short-hop
    energy exceeds ``threshold`` times the running (previous-slot) mean —
    the classic attack detector that motivates window switching.
    Returns a bool array over the ``len(data) // (n_long//2)`` long slots.
    """
    _validate_sizes(n_long, n_short)
    data = np.asarray(data, dtype=np.float64)
    hop_s = n_short // 2
    hop_l = n_long // 2
    n_slots = len(data) // hop_l
    usable = n_slots * hop_l
    env = (data[:usable].reshape(-1, hop_s) ** 2).sum(axis=1)  # short hops
    per_slot = env.reshape(n_slots, hop_l // hop_s)
    peak = per_slot.max(axis=1)
    mean = np.maximum(per_slot.mean(axis=1), 1e-12)
    # Slot 0 has no previous slot; seed with the global median slot energy
    # (not slot 0's own mean, which would make a click at clip start — the
    # canonical pre-echo case — undetectable by construction).
    floor0 = max(float(np.median(mean)), 1e-12)
    prev_mean = np.concatenate([[floor0], mean[:-1]])
    return peak > threshold * np.maximum(prev_mean, 1e-12)


def plan_blocks(num_samples: int, transients: np.ndarray,
                n_long: int = 2048, n_short: int = 256) -> AdaptivePlan:
    """Frame plan over the long-slot grid.

    Slot i (hop ``n_long//2``) is a long frame, unless flagged transient:
    then slots i and i+1 become ``start + 7*(ratio/8 shorts) + stop``
    (``ratio = n_long // n_short`` shorts minus one, so the group advances
    exactly two long hops and stays critically sampled).  The final frame's
    tail is zero-padded at transform time.
    """
    _validate_sizes(n_long, n_short)
    hop_l = n_long // 2
    hop_s = n_short // 2
    n_slots = max(1, num_samples // hop_l)
    flags = np.zeros(n_slots, dtype=bool)
    t = np.asarray(transients, dtype=bool)
    flags[: min(len(t), n_slots)] = t[:n_slots]

    kinds: list[str] = []
    offsets: list[int] = []
    pos = 0
    slot = 0
    # number of shorts in a group: advance must equal 2*hop_l:
    #   hop_l (start) + k*hop_s (shorts) + hop_s (stop) = 2*hop_l
    k_short = (hop_l - hop_s) // hop_s
    while slot < n_slots:
        if flags[slot] and slot + 1 < n_slots:
            kinds.append("start")
            offsets.append(pos)
            pos += hop_l
            for _ in range(k_short):
                kinds.append("short")
                offsets.append(pos)
                pos += hop_s
            kinds.append("stop")
            offsets.append(pos)
            pos += hop_s
            slot += 2
        else:
            kinds.append("long")
            offsets.append(pos)
            pos += hop_l
            slot += 1
    return AdaptivePlan(n_long=n_long, n_short=n_short, kinds=tuple(kinds),
                        offsets=tuple(offsets), num_samples=num_samples)


def stmdct_adaptive(data: jnp.ndarray, plan: AdaptivePlan
                    ) -> dict[str, jnp.ndarray]:
    """Adaptive short-time MDCT -> per-kind coefficient banks.

    Returns {kind: (num_frames_of_kind, (a+b)//2)} — each kind is one
    batched windowed MDCT matmul on the MXU.
    """
    max_end = max(o + sum(plan.halves(k))
                  for k, o in zip(plan.kinds, plan.offsets))
    x = jnp.pad(jnp.asarray(data, dtype=jnp.float32),
                (0, max(0, max_end - int(np.asarray(data).shape[0]))))
    out: dict[str, jnp.ndarray] = {}
    for kind in KINDS:
        sel = [o for k, o in zip(plan.kinds, plan.offsets) if k == kind]
        if not sel:
            continue
        a, b = plan.halves(kind)
        length = a + b
        idx = np.asarray(sel)[:, None] + np.arange(length)[None, :]
        frames = x[idx] * jnp.asarray(plan.window(kind), dtype=jnp.float32)
        out[kind] = mdct(frames, a, b)
    return out


def istmdct_adaptive(coeffs: dict[str, jnp.ndarray], plan: AdaptivePlan
                     ) -> jnp.ndarray:
    """Inverse adaptive STMDCT: per-kind batched IMDCT, synthesis window,
    scatter overlap-add at the plan offsets, trimmed to the signal length."""
    max_end = max(o + sum(plan.halves(k))
                  for k, o in zip(plan.kinds, plan.offsets))
    acc = jnp.zeros((max_end,), dtype=jnp.float32)
    for kind in KINDS:
        if kind not in coeffs:
            continue
        sel = [o for k, o in zip(plan.kinds, plan.offsets) if k == kind]
        a, b = plan.halves(kind)
        frames = imdct(coeffs[kind], a, b)
        frames = frames * jnp.asarray(plan.window(kind), dtype=jnp.float32)
        idx = np.asarray(sel)[:, None] + np.arange(a + b)[None, :]
        acc = acc.at[idx.reshape(-1)].add(frames.reshape(-1))
    return acc[: plan.num_samples]
