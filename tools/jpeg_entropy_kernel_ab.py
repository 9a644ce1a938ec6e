"""JPEG entropy-kernel A/B (r12, VERDICT r11 §Next #6).

cProfile on the r11 decoder showed ~95% of sequential decode wall in
the per-symbol entropy loop — 264k ``_jpeg_decode_sym`` + 530k
``_SegReader.peek/bits/skip`` Python calls per 256x256 4:2:0 image;
the IDCT (already batched per component) was 2%. The r12 kernel
inlines the bit-reader state (acc/nbits/pos as locals) into the
sequential scan loop and fuses LUT symbol decode + magnitude-bit
reads, eliminating the per-coefficient call overhead. Progressive
scans keep the generic reader.

This A/B loads the PRE-r12 media_codecs from git, decodes an 18-case
payload matrix (sampling x restart x progressive x gray x sizes) with
both kernels asserting BYTE-IDENTICAL pixel buffers, then times both
on the sequential matrix. One ledger line per variant.

Usage: python tools/jpeg_entropy_kernel_ab.py [old_rev] [reps]
"""

import importlib.util
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from ingest_spark.operators import media_codecs as new_mc
from tools import scale_runs

old_rev = sys.argv[1] if len(sys.argv) > 1 else "HEAD~1"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

src = subprocess.run(
    ["git", "-C", "/root/repo", "show",
     f"{old_rev}:ingest_spark/operators/media_codecs.py"],
    capture_output=True, text=True, check=True,
).stdout
spec = importlib.util.spec_from_loader("old_media_codecs", loader=None)
old_mc = importlib.util.module_from_spec(spec)
exec(compile(src, "old_media_codecs.py", "exec"), old_mc.__dict__)

rng = np.random.default_rng(7)


def make_img(w, h, channels):
    x = np.linspace(0, 255, w)[None, :] + np.linspace(0, 64, h)[:, None]
    base = (x % 256).astype(np.uint8)
    if channels == 1:
        img = base[..., None]
    else:
        img = np.stack(
            [base, np.roll(base, 13, 1), np.roll(base, 37, 0)], -1
        )
    img = np.clip(
        img.astype(int) + rng.integers(-12, 12, img.shape), 0, 255
    ).astype(np.uint8)
    return bytes(img.tobytes())


CASES = []
for w, h in [(64, 48), (256, 256), (129, 67)]:
    for channels in (1, 3):
        for sampling in ("444", "420", "422"):
            if channels == 1 and sampling != "444":
                continue
            for ri in (0, 4):
                for prog in (False, True):
                    if prog and ri:  # encoder: unsupported combination
                        continue
                    CASES.append((w, h, channels, sampling, ri, prog))

payloads = []
for w, h, channels, sampling, ri, prog in CASES:
    data = new_mc.encode_jpeg(
        w, h, make_img(w, h, channels), channels=channels,
        sampling=sampling, restart_interval=ri, progressive=prog,
    )
    payloads.append(((w, h, channels, sampling, ri, prog), data))

# identity gate: every case byte-identical across kernels
for key, data in payloads:
    a = old_mc.decode_jpeg(data)
    b = new_mc.decode_jpeg(data)
    assert a["pixels"] == b["pixels"], ("pixel mismatch", key)
    assert (a["width"], a["height"], a["mean_value"]) == (
        b["width"], b["height"], b["mean_value"]
    ), key
print(f"identity: {len(payloads)} cases byte-identical", flush=True)

# timing: sequential (inlined entropy loop) and progressive (list
# coefficient rows — per-element numpy scalar indexing dominated the
# AC refine wall) measured separately
for mode, keep in [("sequential", lambda k: not k[5]),
                   ("progressive", lambda k: k[5])]:
    cases = [(k, d) for k, d in payloads if keep(k)]
    for label, mod in [("old", old_mc), ("new", new_mc)]:
        for k, d in cases:  # warm-up
            mod.decode_jpeg(d)
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for k, d in cases:
                mod.decode_jpeg(d)
            walls.append(time.perf_counter() - t0)
        wall = min(walls)
        ms_img = wall / len(cases) * 1000
        print(f"{mode} [{label}]: {wall:.3f}s for {len(cases)} images "
              f"({ms_img:.1f} ms/image avg)", flush=True)
        scale_runs.record(
            {
                "op": f"jpeg_{mode}_decode_{label}",
                "params": {
                    "study": "jpeg_entropy_kernel_ab",
                    "n_images": len(cases),
                    "matrix": "sizes x channels x sampling x restart",
                    "reps": reps,
                    "old_rev": old_rev,
                },
                "wall_sec": round(wall, 3),
                "checksum": {"ms_per_image": round(ms_img, 2),
                             "identity_cases": len(payloads)},
                "agree": True,
            }
        )
