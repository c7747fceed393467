"""Dataset registry + construction (parity: reference datasets/factory.py).

``get_dataset`` resolves a scene filename to a granule: local file under
``<data_root>/HARP2/``, an Earthdata download when the optional
``earthaccess`` dependency is installed (reference harp2.py:432-458), or a
generated synthetic granule for the reserved name ``synthetic[:HxWxV]`` so
the full stack runs offline.
"""

from __future__ import annotations

from pathlib import Path

from atmonr_tpu.data.granule import GranuleArrays, read_granule
from atmonr_tpu.data.harp2 import HARP2Dataset

BANDS = {"HARP2": 4}

DATASETS = {"HARP2": HARP2Dataset}


def _synthetic_from_name(filename: str) -> GranuleArrays:
    from atmonr_tpu.data.synthetic import make_synthetic_granule

    if ":" in filename:
        # "synthetic:HxWxV" or "synthetic:HxWxV:hard" (multi-scale cloud field)
        parts = filename.split(":")
        h, w, v = (int(x) for x in parts[1].split("x"))
        n_blobs = 40 if len(parts) > 2 and parts[2] == "hard" else 1
        return make_synthetic_granule(
            height=h, width=w, views_per_band=v, n_blobs=n_blobs
        )
    return make_synthetic_granule()


def download(filename: str, dst_dir: str | Path, level: str) -> None:
    """Download a HARP2 granule via earthaccess if available.

    Mirrors reference harp2.py:432-458; raises a clear error in offline
    environments.
    """
    try:
        import earthaccess  # type: ignore
    except ImportError as e:
        raise FileNotFoundError(
            f"HARP2 file {filename} not found under {dst_dir} and earthaccess "
            "is not installed (offline environment). Place the granule there "
            "manually or use the 'synthetic' scene name."
        ) from e
    from datetime import datetime, timedelta

    print(f"HARP2 file {filename} not found locally, retrieving via earthaccess…")
    earthaccess.login(persist=True)
    dt = datetime.strptime(filename.split(".")[1], "%Y%m%dT%H%M%S")
    results = earthaccess.search_data(
        short_name=f"PACE_HARP2_{level}_SCI",
        temporal=(
            dt.strftime("%Y-%m-%d"),
            (dt + timedelta(days=1)).strftime("%Y-%m-%d"),
        ),
    )
    if len(results) == 0:
        raise ValueError(f"Could not find {filename} on earthaccess.")
    short = ".".join(filename.split(".")[:4])
    results = [r for r in results if short in r.render_dict["meta"]["native-id"]]
    earthaccess.download(results[0], str(dst_dir))


def get_dataset(
    config: dict, filename: str, data_root: str | Path = "data"
) -> HARP2Dataset:
    """Build the Dataset for ``config["type"]`` and ``filename``."""
    if config["type"] not in DATASETS:
        raise NotImplementedError(
            f"No dataset registered under {config['type']!r}; "
            f"known types: {sorted(DATASETS)}"
        )
    if filename.startswith("synthetic"):
        granule = _synthetic_from_name(filename)
    else:
        local = Path(data_root) / "HARP2" / filename
        if not local.exists():
            download(filename, local.parent, "L1B")
        granule = read_granule(local)
    return DATASETS[config["type"]](config, granule)
