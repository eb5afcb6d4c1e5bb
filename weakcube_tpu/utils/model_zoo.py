"""`cubercnn://` model-zoo URI resolver (reference cubercnn/util/model_zoo.py):
maps zoo URIs onto https://dl.fbaipublicfiles.com/cubercnn/ paths, with a
local cache directory. Download requires egress; in sealed environments,
pre-populate the cache and resolution still works.
"""
from __future__ import annotations

import os

PREFIX = "cubercnn://"
BASE_URL = "https://dl.fbaipublicfiles.com/cubercnn/"
CACHE_DIR = os.path.expanduser("~/.cache/weakcube_tpu/zoo")


def resolve(uri: str) -> str:
    """cubercnn://path -> local file (cached) or the remote URL."""
    if not uri.startswith(PREFIX):
        return uri
    rel = uri[len(PREFIX):]
    local = os.path.join(CACHE_DIR, rel)
    if os.path.exists(local):
        return local
    url = BASE_URL + rel
    try:
        import urllib.request
        os.makedirs(os.path.dirname(local), exist_ok=True)
        urllib.request.urlretrieve(url, local)
        return local
    except Exception as e:  # zero-egress environments
        raise FileNotFoundError(
            f"cannot fetch {url} (no egress?); pre-place the file at {local}"
        ) from e
