"""Generator for the 32-band NPR pseudo-QMF prototype embedded in
``geomesa_ray/stages/mp2.py`` (``_PROTO_B85``).

The MPEG-1 audio filterbank layout (512-tap prototype, 32 bands, hop 32)
is public, but ISO/IEC 11172-3's tabulated window has no closed form. We
therefore DESIGN our own near-perfect-reconstruction prototype with the
standard public method (cosine-modulated pseudo-QMF with alternating
+/- pi/4 phases and a power-complementary lowpass prototype; Rothweiler
1983, Vaidyanathan "Multirate Systems and Filter Banks" ch. 8):

  J(h) = mean_w ( A(w)^2 + A(pi/M - w)^2 - 1 )^2     flatness on [0, pi/M]
       + lam * mean_w A(w)^2                          stopband w > 1.2 pi/M

minimized over the symmetric half of h with plain-numpy Adam (analytic
gradient; A(w) = C @ p is linear in the parameters so J is quartic).
Deterministic: fixed init (Kaiser-windowed sinc), fixed iteration count,
no RNG. The resulting bank measures ~85 dB reconstruction SNR on white
noise (~91 dB on sines) with overall gain exactly 128 = 4M and delay 480
samples under the codec's framing convention — far below the Layer II
quantization noise floor, so the codec's fidelity is quantizer-limited.

Run:  python tools/design_qmf.py          # prints the base85 blob
      python tools/design_qmf.py --check  # regenerates + compares vs mp2.py
"""
from __future__ import annotations

import base64
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

M = 32
NT = 512


def _i0(x: np.ndarray) -> np.ndarray:
    """Modified Bessel I0 by series (converges fast for |x| < ~20)."""
    out = np.ones_like(x)
    term = np.ones_like(x)
    for k in range(1, 60):
        term = term * (x / (2 * k)) ** 2
        out = out + term
    return out


def design(iters: int = 24000, lam: float = 40.0, ngrid: int = 512,
           stop_start: float = 1.20) -> np.ndarray:
    n = np.arange(NT) - (NT - 1) / 2.0
    nh = n[:NT // 2]
    wf = np.linspace(0.0, np.pi / M, ngrid)
    ws = np.linspace(stop_start * np.pi / M, np.pi, 6 * ngrid)
    Cf = 2.0 * np.cos(np.outer(wf, nh))
    Cfm = 2.0 * np.cos(np.outer(np.pi / M - wf, nh))
    Cs = 2.0 * np.cos(np.outer(ws, nh))

    r = 2.0 * np.arange(NT) / (NT - 1) - 1.0
    kais = _i0(9.0 * np.sqrt(np.maximum(0.0, 1 - r * r))) / _i0(np.array(9.0))
    fc = 1.0 / 128.0
    h0 = 2 * fc * np.sinc(2 * fc * n) * kais
    p = h0[:NT // 2].copy()
    p /= (Cf[0] @ p)

    mm = np.zeros_like(p)
    v = np.zeros_like(p)
    b1, b2, eps = 0.9, 0.999, 1e-9
    for t in range(1, iters + 1):
        lr = 2e-4 * (0.25 ** (t // 6000))
        Af = Cf @ p
        Am = Cfm @ p
        As = Cs @ p
        e = Af * Af + Am * Am - 1.0
        g = (4.0 / len(e)) * ((e * Af) @ Cf + (e * Am) @ Cfm) \
            + (2.0 * lam / len(As)) * (As @ Cs)
        mm = b1 * mm + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        p = p - lr * (mm / (1 - b1 ** t)) / (np.sqrt(v / (1 - b2 ** t)) + eps)
    return np.concatenate([p, p[::-1]])


def to_b85(h: np.ndarray) -> str:
    return base64.b85encode(h.astype("<f8").tobytes()).decode("ascii")


def main() -> None:
    h = design()
    blob = to_b85(h)
    if "--check" in sys.argv:
        from geomesa_ray.stages.mp2 import _prototype
        emb = _prototype()
        print("max |regen - embedded|:", float(np.abs(h - emb).max()))
        print("match (1e-12):", bool(np.allclose(h, emb, atol=1e-12)))
        return
    # wrapped for embedding
    for i in range(0, len(blob), 76):
        print(f'    "{blob[i:i + 76]}"')


if __name__ == "__main__":
    main()
