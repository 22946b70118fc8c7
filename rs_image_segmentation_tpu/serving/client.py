"""Minimal stdlib client for the serving HTTP API."""

from __future__ import annotations

import io
import json
import urllib.request
from typing import Optional, Sequence, Tuple

import numpy as np


def _post(url: str, body: bytes, ctype: str, timeout: float):
    req = urllib.request.Request(url, data=body, method="POST",
                                 headers={"Content-Type": ctype})
    return urllib.request.urlopen(req, timeout=timeout)


def classify_array(base_url: str, scene: np.ndarray,
                   timeout: float = 300.0,
                   method: Optional[str] = None) -> np.ndarray:
    """POST a (7, H, W) uint8 scene as npy; returns the (H, W) class map.
    ``method`` selects the per-request classification method."""
    buf = io.BytesIO()
    np.save(buf, np.asarray(scene))
    url = f"{base_url}/v1/classify" + (f"?method={method}" if method else "")
    with _post(url, buf.getvalue(),
               "application/x-npy", timeout) as resp:
        return np.load(io.BytesIO(resp.read()), allow_pickle=False)


def classify_tiff(base_url: str, tif_path: str, out_path: Optional[str] = None,
                  timeout: float = 300.0,
                  method: Optional[str] = None) -> Optional[np.ndarray]:
    """POST GeoTIFF bytes. With ``out_path``: writes the GeoTIFF class map
    (geo metadata preserved) and returns None; without: returns the map
    as an array (``?format=npy``)."""
    with open(tif_path, "rb") as f:
        body = f.read()
    q = []
    if not out_path:
        q.append("format=npy")
    if method:
        q.append(f"method={method}")
    url = f"{base_url}/v1/classify" + ("?" + "&".join(q) if q else "")
    with _post(url, body, "image/tiff", timeout) as resp:
        payload = resp.read()
    if out_path:
        with open(out_path, "wb") as f:
            f.write(payload)
        return None
    return np.load(io.BytesIO(payload), allow_pickle=False)


def warmup(base_url: str, shapes: Sequence[Tuple[int, int]],
           buckets: Optional[Sequence[int]] = None,
           methods: Optional[Sequence[str]] = None,
           timeout: float = 1200.0) -> dict:
    body = json.dumps({"shapes": [list(s) for s in shapes],
                       **({"buckets": list(buckets)} if buckets else {}),
                       **({"methods": list(methods)} if methods else {})})
    with _post(f"{base_url}/warmup", body.encode(), "application/json",
               timeout) as resp:
        return json.loads(resp.read())


def stats(base_url: str, timeout: float = 30.0) -> dict:
    with urllib.request.urlopen(f"{base_url}/stats", timeout=timeout) as r:
        return json.loads(r.read())


def healthz(base_url: str, timeout: float = 30.0) -> dict:
    with urllib.request.urlopen(f"{base_url}/healthz", timeout=timeout) as r:
        return json.loads(r.read())
