"""VLM-pretraining dataset fetch/prepare CLI.

Covers the reference's LLaVA data tooling (scripts/preprocess.py +
prismatic/preprocessing/download.py:32-207): a registry of the LLaVA v1.5
dataset components (align-stage chat.json + images; finetune-stage
mix665k + COCO/GQA/OCR-VQA/TextVQA/VisualGenome image sets), a
download-and-extract driver, and the OCR-VQA GIF/PNG -> JPG conversion the
finetune stage needs. Network-gated like data/download.py — zero-egress
environments stage the files by other means and still use the extract +
convert paths.

    python -m vla_adapter_tpu.data.vlm_datasets \
        --dataset_id llava-laion-cc-sbu-558k --root_dir data
"""

from __future__ import annotations

import dataclasses
import shutil
import tarfile
import urllib.request
from pathlib import Path
from typing import Dict, List
from zipfile import ZipFile

from vla_adapter_tpu.core.cli import parse_config
from vla_adapter_tpu.utils.overwatch import initialize_overwatch

log = initialize_overwatch(__name__)

# Factual registry of the public LLaVA v1.5 artifacts (same sources the
# reference pulls — prismatic/preprocessing/download.py:32-105).
# name: final path under <root>/download/<dataset_id>/ ;
# extract: archive vs plain file; rename: move the extracted/downloaded
# path to `name` (archives whose top-level dir differs from `name`).
DATASET_REGISTRY: Dict[str, List[Dict]] = {
    "llava-laion-cc-sbu-558k": [
        {"name": "chat.json", "extract": False, "rename": True,
         "url": ("https://huggingface.co/datasets/liuhaotian/LLaVA-Pretrain/"
                 "resolve/main/blip_laion_cc_sbu_558k.json")},
        {"name": "images", "extract": True, "rename": False,
         "url": ("https://huggingface.co/datasets/liuhaotian/LLaVA-Pretrain/"
                 "resolve/main/images.zip")},
    ],
    "llava-v1.5-instruct": [
        {"name": "llava_v1_5_mix665k.json", "extract": False, "rename": True,
         "url": ("https://huggingface.co/datasets/liuhaotian/"
                 "LLaVA-Instruct-150K/resolve/main/llava_v1_5_mix665k.json")},
        {"name": "coco/train2017", "extract": True, "rename": True,
         "url": "http://images.cocodataset.org/zips/train2017.zip"},
        {"name": "gqa/images", "extract": True, "rename": True,
         "url": "https://downloads.cs.stanford.edu/nlp/data/gqa/images.zip"},
        {"name": "ocr_vqa/images", "extract": True, "rename": True,
         "url": ("https://huggingface.co/datasets/qnguyen3/ocr_vqa/"
                 "resolve/main/ocr_vqa.zip")},
        {"name": "textvqa/train_images", "extract": True, "rename": True,
         "url": ("https://dl.fbaipublicfiles.com/textvqa/images/"
                 "train_val_images.zip")},
        {"name": "vg/VG_100K", "extract": True, "rename": True,
         "url": "https://cs.stanford.edu/people/rak248/VG_100K_2/images.zip"},
        {"name": "vg/VG_100K_2", "extract": True, "rename": True,
         "url": "https://cs.stanford.edu/people/rak248/VG_100K_2/images2.zip"},
    ],
}


def download_file(url: str, dest_dir: Path) -> Path:
    """Fetch url into dest_dir (skips if present). Network-gated."""
    dest_dir.mkdir(parents=True, exist_ok=True)
    dest = dest_dir / Path(url).name
    if dest.exists():
        log.info("already downloaded: %s", dest)
        return dest
    log.info("downloading %s -> %s", url, dest)
    tmp = dest.with_suffix(dest.suffix + ".part")
    with urllib.request.urlopen(url) as resp, open(tmp, "wb") as f:
        shutil.copyfileobj(resp, f, length=1 << 20)
    tmp.rename(dest)
    return dest


def extract_archive(archive: Path, dest_dir: Path) -> Path:
    """Extract a .zip / .tar(.gz) archive; returns the top-level extracted
    path (dir for multi-member archives, the file itself otherwise)."""
    log.info("extracting %s", archive.name)
    if archive.suffix == ".zip":
        with ZipFile(archive) as zf:
            names = zf.namelist()
            zf.extractall(dest_dir)
    elif archive.suffix in (".tar", ".gz", ".tgz") or archive.name.endswith(
            ".tar.gz"):
        with tarfile.open(archive) as tf:
            names = tf.getnames()
            tf.extractall(dest_dir, filter="data")
    else:
        raise ValueError(f"unsupported archive type: {archive.name}")
    top = dest_dir / names[0].split("/")[0]
    return top


def download_extract(dataset_id: str, root_dir, cleanup: bool = False) -> Path:
    """Materialize every component of a registered dataset under
    <root_dir>/download/<dataset_id>/ (reference download.py:191-207)."""
    assert dataset_id in DATASET_REGISTRY, (
        f"unknown dataset {dataset_id!r}; known: {sorted(DATASET_REGISTRY)}")
    download_dir = Path(root_dir) / "download" / dataset_id
    download_dir.mkdir(parents=True, exist_ok=True)

    for comp in DATASET_REGISTRY[dataset_id]:
        final = download_dir / comp["name"]
        if final.exists():
            log.info("present: %s", final)
            continue
        path = download_file(comp["url"], download_dir)
        if comp["extract"]:
            extracted = extract_archive(path, download_dir)
            if cleanup:
                path.unlink()
            path = extracted
        if comp["rename"] and path != final:
            final.parent.mkdir(parents=True, exist_ok=True)
            shutil.move(str(path), str(final))
    return download_dir


def convert_images_to_jpg(image_dir) -> int:
    """GIF/PNG -> JPG conversion for OCR-VQA (reference download.py:109-124):
    GIFs take frame 0; existing .jpg/.jpeg (or already-converted stems) are
    skipped. Returns the number of files converted."""
    from PIL import Image

    image_dir = Path(image_dir)
    converted = 0
    for fn in sorted(image_dir.iterdir()):
        jpg = image_dir / f"{fn.stem}.jpg"
        if fn.suffix in (".jpg", ".jpeg") or jpg.exists():
            continue
        if fn.suffix == ".gif":
            gif = Image.open(fn)
            gif.seek(0)
            gif.convert("RGB").save(jpg)
        elif fn.suffix == ".png":
            Image.open(fn).convert("RGB").save(jpg)
        else:
            raise ValueError(f"unexpected image format {fn.suffix!r} ({fn})")
        converted += 1
    log.info("converted %d images in %s", converted, image_dir)
    return converted


@dataclasses.dataclass(frozen=True)
class PreprocessConfig:
    dataset_id: str = "llava-v1.5-instruct"
    root_dir: str = "data"
    cleanup_archives: bool = False


def main(argv=None) -> None:
    cfg = parse_config(PreprocessConfig, argv)
    out = download_extract(cfg.dataset_id, cfg.root_dir,
                           cleanup=cfg.cleanup_archives)
    if cfg.dataset_id == "llava-v1.5-instruct":
        # OCR-VQA ships GIFs/PNGs; the chat JSON references .jpg paths
        convert_images_to_jpg(out / "ocr_vqa" / "images")
    log.info("dataset ready at %s", out)


if __name__ == "__main__":
    main()
