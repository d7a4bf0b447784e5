"""Host-preprocessing throughput: native (libcvtpre) vs PIL path.

Measures the full eval-sample pipeline (decode JPEG+PNG, rot90 check,
1024px bilinear + nearest, 336px bicubic+crop, fp32 normalise) at 1 and N
threads — the native path's win comes from the fused C pipeline and from
releasing the GIL for the whole sample.

Usage: python scripts/bench_native_preproc.py [--threads 8] [--n 64]
"""

import argparse
import io
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from camouflaged_vlm_tpu.data.loader import _load_eval_sample  # noqa: E402
from camouflaged_vlm_tpu.data.ovcamo import OVCamoSample  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--size", type=int, default=1024)
    args = ap.parse_args()

    import tempfile

    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="natbench")
    # typical OVCamo source: ~700x500 JPEG image + same-size PNG mask
    img = rng.integers(0, 256, (500, 700, 3), np.uint8)
    mask = ((rng.random((500, 700)) > 0.5) * 255).astype(np.uint8)
    ip, mp = os.path.join(tmp, "i.jpg"), os.path.join(tmp, "m.png")
    Image.fromarray(img).save(ip, "JPEG", quality=90)
    Image.fromarray(mask, "L").save(mp, "PNG")
    s = OVCamoSample(class_label="c", class_id=0, image_path=ip, mask_path=mp)

    def run(native: bool, threads: int) -> float:
        def one(_):
            return _load_eval_sample(s, args.size, 336, use_native=native)

        one(0)  # warm caches
        t0 = time.perf_counter()
        if threads <= 1:
            for i in range(args.n):
                one(i)
        else:
            with ThreadPoolExecutor(threads) as pool:
                list(pool.map(one, range(args.n)))
        return args.n / (time.perf_counter() - t0)

    for threads in (1, args.threads):
        pil = run(False, threads)
        nat = run(True, threads)
        print(
            f"threads={threads:2d}  PIL {pil:7.2f} img/s   "
            f"native {nat:7.2f} img/s   speedup {nat / pil:.2f}x"
        )


if __name__ == "__main__":
    main()
