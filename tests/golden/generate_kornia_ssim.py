"""One-off kornia SSIM fixture generator (VERDICT r3 item 8).

The reference computes SSIM via kornia==0.7.3 (``utils/losses.py:27``,
``requirements.txt``), but kornia is NOT installed in the build container
(zero egress), so the suite validates our SSIM against two independent
oracles instead: a scipy Gaussian-window implementation and a literal torch
transcription of the kornia-0.7.3 algorithm (tests/test_losses.py).  Both
agree to 1e-6 — but transcription-vs-transcription leaves a residual "did
we transcribe the same bug twice" risk.

Run THIS script once in any environment that has kornia (any version of
the 0.7.x line):

    python tests/golden/generate_kornia_ssim.py

It writes ``ssim_kornia.npz`` — deterministic inputs + the library's SSIM
maps for windows 5/7/11 — and
``tests/test_losses.py::test_ssim_matches_kornia_fixture`` picks the
fixture up automatically (it skips while the file is absent).
"""

import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "ssim_kornia.npz")


def main():
    import kornia
    import torch

    rng = np.random.default_rng(42)
    x = rng.random((2, 3, 40, 40)).astype(np.float32)
    y = np.clip(x + 0.08 * rng.standard_normal(x.shape).astype(np.float32),
                0, 1)
    arrays = {"x": x, "y": y, "kornia_version": np.array(kornia.__version__)}
    with torch.no_grad():
        for ws in (5, 7, 11):
            m = kornia.metrics.ssim(torch.from_numpy(x), torch.from_numpy(y),
                                    window_size=ws, max_val=1.0)
            arrays[f"ssim_w{ws}"] = m.numpy()
    np.savez_compressed(OUT, **arrays)
    print(f"wrote {OUT} (kornia {kornia.__version__})")


if __name__ == "__main__":
    main()
