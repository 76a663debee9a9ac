"""Dataset / pretrained-weight download automation.

Capability parity with the reference `src/utils/download.py:17-344`:
streamed download with progress, zip extraction with nested-dir
flattening, EuroSAT-MS and SatMAE-weights fetchers, presence/size
verification, and checkpoint introspection. Uses urllib (stdlib) instead
of requests; every network call degrades gracefully to actionable manual
instructions (the reference printed the same, scripts/train.py:85-93).
"""

from __future__ import annotations

import logging
import shutil
import zipfile
from pathlib import Path
from typing import Optional

logger = logging.getLogger(__name__)

# Reference URLs (download.py:98-192)
EUROSAT_MS_URL = "https://madm.dfki.de/files/sentinel/EuroSATallBands.zip"
SATMAE_WEIGHTS_URL = (
    "https://zenodo.org/record/7338613/files/pretrain-vit-base-e199.pth"
)


def download_file(
    url: str, dest: str | Path, chunk_size: int = 1 << 20, timeout: int = 30
) -> Path:
    """Streamed download with a progress log every ~64 MB."""
    import urllib.request

    dest = Path(dest)
    dest.parent.mkdir(parents=True, exist_ok=True)
    tmp = dest.with_suffix(dest.suffix + ".part")

    req = urllib.request.Request(url, headers={"User-Agent": "msid-tpu/1.0"})
    with urllib.request.urlopen(req, timeout=timeout) as r, open(tmp, "wb") as f:
        total = int(r.headers.get("Content-Length") or 0)
        done = 0
        while True:
            chunk = r.read(chunk_size)
            if not chunk:
                break
            f.write(chunk)
            done += len(chunk)
            if done % (64 << 20) < chunk_size:
                pct = f" ({100 * done / total:.0f}%)" if total else ""
                logger.info("downloaded %.1f MB%s", done / 1e6, pct)
    tmp.rename(dest)
    logger.info("saved %s (%.1f MB)", dest, dest.stat().st_size / 1e6)
    return dest


def extract_zip(zip_path: str | Path, dest_dir: str | Path) -> Path:
    """Extract + flatten a single nested top-level directory
    (reference download.py:61-95, 128-148)."""
    zip_path, dest_dir = Path(zip_path), Path(dest_dir)
    dest_dir.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(zip_path) as zf:
        zf.extractall(dest_dir)

    entries = [p for p in dest_dir.iterdir() if not p.name.startswith(".")]
    if len(entries) == 1 and entries[0].is_dir():
        nested = entries[0]
        for child in nested.iterdir():
            shutil.move(str(child), str(dest_dir / child.name))
        nested.rmdir()
    return dest_dir


def download_eurosat(data_dir: str | Path) -> Optional[Path]:
    """Fetch + extract EuroSAT-MS (≈2 GB). Returns None on failure with
    manual instructions logged."""
    data_dir = Path(data_dir)
    if verify_eurosat(data_dir):
        logger.info("EuroSAT-MS already present at %s", data_dir)
        return data_dir
    try:
        zip_path = download_file(EUROSAT_MS_URL, data_dir.parent / "EuroSATallBands.zip")
        extract_zip(zip_path, data_dir)
        zip_path.unlink()
        return data_dir if verify_eurosat(data_dir) else None
    except Exception as e:  # noqa: BLE001 — degrade to manual instructions
        logger.warning(
            "EuroSAT download failed (%s). Fetch manually:\n"
            "  curl -LO %s\n  unzip EuroSATallBands.zip -d %s",
            e, EUROSAT_MS_URL, data_dir,
        )
        return None


def download_satmae_weights(weights_path: str | Path) -> Optional[Path]:
    """Fetch the SatMAE ViT-Base pretrain checkpoint (≈1.3 GB torch .pth)."""
    weights_path = Path(weights_path)
    if weights_path.exists() and weights_path.stat().st_size > 100 << 20:
        logger.info("SatMAE weights already present at %s", weights_path)
        return weights_path
    try:
        return download_file(SATMAE_WEIGHTS_URL, weights_path)
    except Exception as e:  # noqa: BLE001
        logger.warning(
            "SatMAE weights download failed (%s). Fetch manually:\n"
            "  curl -L -o %s %s",
            e, weights_path, SATMAE_WEIGHTS_URL,
        )
        return None


def verify_eurosat(data_dir: str | Path, min_classes: int = 9) -> bool:
    """Presence check: ≥min_classes class dirs containing .tif tiles
    (reference download.py:235-275)."""
    data_dir = Path(data_dir)
    if not data_dir.is_dir():
        return False
    class_dirs = [
        d for d in data_dir.iterdir() if d.is_dir() and any(d.glob("*.tif"))
    ]
    return len(class_dirs) >= min_classes


def verify_downloads(config: dict) -> dict:
    """Presence/size report for dataset + weights per the config."""
    data_dir = Path(config.get("data", {}).get("root_dir", "data/EuroSAT_MS"))
    weights = config.get("model", {}).get("encoder", {}).get("pretrained_path")
    report = {
        "dataset_present": verify_eurosat(data_dir),
        "dataset_path": str(data_dir),
        "weights_present": bool(
            weights and Path(weights).exists()
            and Path(weights).stat().st_size > 100 << 20
        ),
        "weights_path": str(weights),
    }
    return report


def setup_project_data(config: dict) -> dict:
    """One-call fetch of everything the config needs
    (reference download.py:195-232)."""
    report = verify_downloads(config)
    if not report["dataset_present"]:
        download_eurosat(report["dataset_path"])
    weights = config.get("model", {}).get("encoder", {}).get("pretrained_path")
    if weights and not report["weights_present"]:
        download_satmae_weights(weights)
    return verify_downloads(config)


def inspect_checkpoint(path: str | Path) -> dict:
    """Introspect a torch .pth or an Orbax checkpoint directory without
    loading weights onto a device (reference download.py:278-344)."""
    path = Path(path)
    if path.is_dir():
        steps = sorted(
            int(p.name) for p in path.iterdir() if p.is_dir() and p.name.isdigit()
        )
        return {"format": "orbax", "steps": steps, "path": str(path)}
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("model", ckpt.get("state_dict", ckpt))
    keys = list(state.keys()) if hasattr(state, "keys") else []
    return {
        "format": "torch",
        "top_level_keys": list(ckpt.keys()) if hasattr(ckpt, "keys") else [],
        "num_tensors": len(keys),
        "sample_keys": keys[:8],
        "path": str(path),
    }
