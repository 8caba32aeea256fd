"""Benchmark stand-ins: vendorable PieBench-140 editing + COCO/Parti
generation prompt sets (C30).

The reference ships benchmark CSVs (`running/benchmarks/instructions/
editing_pie_bench_140.csv` — 140 one-word replacement rows with blended
words) plus source images that cannot enter this zero-egress container.
This tool manufactures a protocol-complete stand-in:

  * a 140-row CSV in the reference's editing schema (file_name,
    old_caption, edited_caption, blended_words) built from our own prompt
    templates — every row a same-length one-word replacement so the full
    `--is_replacement` protocol (reference `edit.py:355-359`) keeps all
    140 rows. Rows alternate between PieBench's space-separated
    blended-word format and COCO-editing's "('a', 'b')" tuple format so
    both parser paths (data/benchmarks.py) execute.
  * the 140 source images, *pipeline-generated* from the source captions
    (`generate_images`), so the editing protocol runs end-to-end exactly
    like the reference's PieBench sweep (`edit.py:465-486`).

It also manufactures GENERATION benchmark stand-ins (VERDICT r4 item 5)
mirroring the reference's two generation schemas exactly:

  * benchmarks/generation_coco_standin.csv — 600 COCO-caption-style rows
    in the `generation_coco.csv` schema: a leading unnamed pandas index
    column + (file_name, caption), full-sentence captions.
  * benchmarks/generation_parti_standin.csv — 128 Parti-Prompts-style
    rows in the `generation_parti-prompts.csv` schema: unnamed index +
    (id, caption), no file_name column — exercising the loader's id
    fallback.

Usage:
  python tools/make_benchmark_standin.py --csv_only          # just the CSVs
  python tools/make_benchmark_standin.py --model sd15 \
      --out benchmarks/piebench140_standin                   # CSV + images
"""
from __future__ import annotations

import argparse
import csv
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

DEFAULT_CSV = os.path.join(_REPO, "benchmarks", "piebench140_standin.csv")

_ANIMALS = [
    ("corgi", "cat"), ("rabbit", "fox"), ("horse", "zebra"),
    ("duck", "swan"), ("tiger", "lion"), ("owl", "parrot"),
    ("sheep", "goat"),
]
_SETTINGS = [
    "on the beach", "in the forest", "on a city street", "in the snow",
    "in a meadow", "next to a lake", "on a wooden bridge", "under a tree",
    "in the desert", "on a mountain trail",
]
_STYLES = ["a photo of", "an oil painting of"]


def build_rows(n: int = 140):
    """n deterministic one-word-replacement rows (subject swap)."""
    rows = []
    i = 0
    for style in _STYLES:
        for setting in _SETTINGS:
            for src_word, tgt_word in _ANIMALS:
                if len(rows) >= n:
                    return rows
                src = f"{style} a {src_word} {setting}"
                tgt = f"{style} a {tgt_word} {setting}"
                # alternate the two on-disk blended_words formats
                blend = (
                    f"{src_word} {tgt_word}"
                    if i % 2 == 0
                    else f"('{src_word}', '{tgt_word}')"
                )
                rows.append(
                    {
                        "file_name": f"{len(rows):05d}.jpg",
                        "old_caption": src,
                        "edited_caption": tgt,
                        "blended_words": blend,
                    }
                )
                i += 1
    return rows


def write_csv(path: str = DEFAULT_CSV, n: int = 140) -> str:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rows = build_rows(n)
    with open(path, "w", newline="", encoding="utf-8") as f:
        w = csv.DictWriter(
            f, fieldnames=["file_name", "old_caption", "edited_caption",
                           "blended_words"]
        )
        w.writeheader()
        w.writerows(rows)
    return path


GEN_COCO_CSV = os.path.join(_REPO, "benchmarks", "generation_coco_standin.csv")
GEN_PARTI_CSV = os.path.join(_REPO, "benchmarks",
                             "generation_parti_standin.csv")

# COCO-caption-style sentence parts (captions are full sentences with
# varied length/punctuation, like the real val2014 captions).
_SUBJECTS = [
    "A corgi", "Two cats", "A group of people", "An old man", "A young girl",
    "A delivery truck", "Three dogs", "A flock of birds", "A baseball player",
    "A woman in a red coat",
]
_VERBS = [
    "sitting", "running", "sleeping", "standing", "playing", "eating",
    "walking", "resting", "waiting", "jumping",
]
_PLACES = [
    "on a sandy beach", "in a busy kitchen", "next to a parked car",
    "under a large umbrella", "on an unmade bed", "near a train station",
    "in a sunny meadow", "beside a brick wall", "on a wooden dock",
    "in front of a grocery store",
]
_PARTI_THEMES = [
    "a watercolor painting of {}", "a low-poly render of {}",
    "a charcoal sketch of {}", "a neon sign that says {}",
    "an isometric diagram of {}", "a macro photograph of {}",
    "a stained-glass window depicting {}", "a papercraft model of {}",
]
_PARTI_OBJECTS = [
    "a lighthouse at dusk", "two robots playing chess", "a bowl of ramen",
    "a city in the clouds", "an origami crane", "a vintage typewriter",
    "a coral reef", "a steam locomotive", "a violin on a chair",
    "a cactus wearing a hat", "a map of an imaginary island",
    "a clockwork heart", "a library staircase", "a field of wind turbines",
    "a teapot shaped like a whale", "an astronaut riding a bicycle",
]


def write_generation_csvs(coco_path: str = GEN_COCO_CSV,
                          parti_path: str = GEN_PARTI_CSV,
                          coco_rows: int = 600) -> tuple:
    """Write the two generation stand-ins in the reference's exact
    on-disk schemas (incl. the leading unnamed index column)."""
    os.makedirs(os.path.dirname(coco_path), exist_ok=True)
    with open(coco_path, "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f)
        w.writerow(["", "file_name", "caption"])
        n = 0
        for subj in _SUBJECTS:
            for verb in _VERBS:
                for place in _PLACES:
                    if n >= coco_rows:
                        break
                    cap = f"{subj} {verb} {place}."
                    w.writerow([n * 37 + 11,
                                f"COCO_standin_{n:012d}.jpg", cap])
                    n += 1
    with open(parti_path, "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f)
        w.writerow(["", "id", "caption"])
        n = 0
        for theme in _PARTI_THEMES:
            for obj in _PARTI_OBJECTS:
                if n >= 128:
                    break
                w.writerow([n, n, theme.format(obj)])
                n += 1
    return coco_path, parti_path


def generate_images(pipe, csv_path: str, image_root: str, batch: int = 4,
                    seed: int = 0):
    """Pipeline-generate the source images for every CSV row."""
    import jax
    import numpy as np
    from PIL import Image

    from invertible_cd_tpu.data import load_benchmark

    os.makedirs(image_root, exist_ok=True)
    rows = load_benchmark(csv_path, kind="editing")
    todo = [r for r in rows if not os.path.exists(
        os.path.join(image_root, r.file_name))]
    key = jax.random.PRNGKey(seed)
    for start in range(0, len(todo), batch):
        chunk = todo[start:start + batch]
        # fixed batch size -> one compiled program for the whole sweep
        prompts = [r.source_prompt for r in chunk]
        while len(prompts) < batch:
            prompts.append(prompts[-1])
        key, sub = jax.random.split(key)
        images, _ = pipe.generate(prompts, key=sub)
        arr = (np.asarray(images[: len(chunk)]) * 255).astype(np.uint8)
        for r, img in zip(chunk, arr):
            Image.fromarray(img).save(os.path.join(image_root, r.file_name))
        print(f"  images {start + len(chunk)}/{len(todo)}", flush=True)
    return image_root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", default=DEFAULT_CSV)
    ap.add_argument("--rows", type=int, default=140)
    ap.add_argument("--csv_only", action="store_true")
    ap.add_argument("--model", default="sd15", choices=["sd15", "tiny"])
    ap.add_argument("--image_root", default=None,
                    help="default: <csv dir>/piebench140_images")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    path = write_csv(args.csv, args.rows)
    print(f"wrote {args.rows}-row editing benchmark to {path}")
    coco, parti = write_generation_csvs()
    print(f"wrote generation benchmarks to {coco}, {parti}")
    if args.csv_only:
        return
    from cli.generate import build_pipeline

    class _A:  # minimal arg surface build_pipeline reads
        model = args.model
        platform = None
        quantize = "off"
        reverse_timesteps = None
        forward_timesteps = None
        reverse_lora = forward_lora = teacher_checkpoint = None
        vae_checkpoint = text_checkpoint = None
        seed = args.seed

    pipe = build_pipeline(_A())
    image_root = args.image_root or os.path.join(
        os.path.dirname(path), "piebench140_images"
    )
    generate_images(pipe, path, image_root)
    print(f"wrote source images to {image_root}")


if __name__ == "__main__":
    main()
