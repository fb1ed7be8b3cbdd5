"""vidi-tpu: TPU-native framework for Dattn video-understanding LMMs.

Public surface (lazy imports — pulling in jax only when used):

    from vidi_tpu import DattnConfig, load_model, ask, generate

    params, cfg, tok = load_model("/path/to/vidi1.5-9b")
    print(ask("a red car", "video.mp4", params, cfg, tok))

See README.md for the architecture and PARITY.md for the reference map.
"""

__version__ = "0.1.0"

_LAZY = {
    "DattnConfig": ("vidi_tpu.core.config", "DattnConfig"),
    "TextConfig": ("vidi_tpu.core.config", "TextConfig"),
    "VisionConfig": ("vidi_tpu.core.config", "VisionConfig"),
    "AudioConfig": ("vidi_tpu.core.config", "AudioConfig"),
    "load_model": ("vidi_tpu.infer.loader", "load_model"),
    "generate": ("vidi_tpu.infer.generate", "generate"),
    "ask": ("vidi_tpu.infer.pipeline", "ask"),
    "quantize_params": ("vidi_tpu.infer.quantize", "quantize_params"),
    "make_mesh": ("vidi_tpu.core.mesh", "make_mesh"),
}

__all__ = sorted(_LAZY) + ["__version__"]


def __getattr__(name):
    try:
        module, attr = _LAZY[name]
    except KeyError:
        raise AttributeError(f"module 'vidi_tpu' has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(module), attr)
