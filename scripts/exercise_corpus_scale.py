"""Exercise the corpus-scale prompt-embedding pipeline (SURVEY §7.3-7).

Validates the path CP100k-scale training depends on: md5-keyed disk cache of
local (77x1024) + global embeddings, MEMORY-MAPPED local loads above the
512-prompt threshold (multi_prompt.py:166-188), and host-side per-batch
__call__ stacking. Reports cache size, prepare/load wall time, per-call
latency, and the process RSS (which must stay far below the cache size —
that is the point of the mmap design).

Usage:
    python scripts/exercise_corpus_scale.py --library instant3d_17000_prompt_library
    python scripts/exercise_corpus_scale.py --synthetic 2000
    ... [--keep] [--calls 50] [--batch 4]

Runs offline (deterministic pseudo-embeddings) — identical shapes/IO to the
real CLIP path.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import resource
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--library", default=None,
                    help="library json name under load/ (no extension)")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate a synthetic N-prompt library instead")
    ap.add_argument("--cache_dir", default="/tmp/sdtpu_corpus_cache")
    ap.add_argument("--calls", type=int, default=50)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--keep", action="store_true",
                    help="keep the cache dir for a second (warm) run")
    args = ap.parse_args()

    import numpy as np

    import scaledreamer_tpu as sd
    from scaledreamer_tpu.core.config import parse_structured

    sd.ensure_builtins()

    lib_dir = "load"
    lib_name = args.library
    if args.synthetic:
        lib_dir = "/tmp/sdtpu_corpus_lib"
        lib_name = f"synthetic_{args.synthetic}"
        os.makedirs(lib_dir, exist_ok=True)
        prompts = [f"a photorealistic object number {i}, studio lighting"
                   for i in range(args.synthetic)]
        with open(os.path.join(lib_dir, lib_name + ".json"), "w") as f:
            json.dump({"train": prompts, "val": prompts[:8],
                       "test": prompts[:8]}, f)
    elif not lib_name:
        ap.error("need --library or --synthetic")

    cls = sd.find("stable-diffusion-multi-prompt-processor")
    t0 = time.perf_counter()
    proc = cls(cfg=parse_structured(cls.Config, {
        "prompt_library": lib_name,
        "prompt_library_dir": lib_dir,
        "pretrained_model_name_or_path": "__offline__",
        "use_perp_neg": True,
        "cache_dir": args.cache_dir,
    }))
    t_configure = time.perf_counter() - t0

    n_prompts = len(proc.all_prompts)
    n_files = len(os.listdir(args.cache_dir))
    cache_bytes = sum(
        e.stat().st_size for e in os.scandir(args.cache_dir))
    mmapped = isinstance(
        next(iter(proc.local_text_embeddings.values())), np.memmap)

    train = proc.prompt_library["train"]
    rng = random.Random(0)
    lat = []
    for _ in range(args.calls):
        batch = [rng.choice(train) for _ in range(args.batch)]
        t1 = time.perf_counter()
        out = proc(prompt=batch)
        _ = (np.asarray(out.text_embeddings).sum()
             + np.asarray(out.global_text_embeddings).sum()
             + np.asarray(out.text_embeddings_vd).sum())
        lat.append((time.perf_counter() - t1) * 1e3)
    lat.sort()

    result = {
        "library": lib_name,
        "n_prompts": n_prompts,
        "cache_files": n_files,
        "cache_gb": round(cache_bytes / 1e9, 2),
        "prepare_plus_load_s": round(t_configure, 1),
        "locals_memory_mapped": bool(mmapped),
        "call_ms_p50": round(lat[len(lat) // 2], 2),
        "call_ms_p95": round(lat[int(len(lat) * 0.95)], 2),
        "rss_mb": round(rss_mb(), 1),
        "batch": args.batch,
    }
    print(json.dumps(result))
    if not args.keep:
        shutil.rmtree(args.cache_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
