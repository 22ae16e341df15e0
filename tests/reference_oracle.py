"""Helpers to import the read-only reference implementation as a test oracle.

The reference repo (torch) is mounted at /root/reference.  Importing parts of
it lets tests check *numerical parity of converted checkpoints* against the
original model family.  Missing heavy deps (librosa, torchaudio, ...) are
stubbed just enough for module import; tests that need them skip when absent.
"""

import importlib.machinery
import os
import sys
import types


def _stub_module(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    mod.__path__ = []
    # give the stub a real spec so importlib.util.find_spec works on it
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None, is_package=True)
    return mod

REFERENCE_PATH = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_PATH, "indextts"))


def install_reference():
    """Put the reference on sys.path with lightweight dependency stubs."""
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    if "librosa" not in sys.modules:
        librosa = _stub_module("librosa")
        util = _stub_module("librosa.util")
        util.normalize = lambda x, **k: x
        filters = _stub_module("librosa.filters")

        def _mel(**kwargs):
            from voice_tts_tpu.audio.filters import slaney_mel_matrix
            return slaney_mel_matrix(kwargs["sr"], kwargs["n_fft"],
                                     kwargs["n_mels"], kwargs.get("fmin", 0.0),
                                     kwargs.get("fmax"))

        filters.mel = _mel
        librosa.util = util
        librosa.filters = filters
        sys.modules.update({"librosa": librosa, "librosa.util": util,
                            "librosa.filters": filters})
    if "torchaudio" not in sys.modules:
        ta = _stub_module("torchaudio")
        taf = _stub_module("torchaudio.functional")
        taff = _stub_module("torchaudio.functional.functional")
        taff._hz_to_mel = lambda f: f
        taff._mel_to_hz = lambda m: m
        taf.functional = taff
        ta.functional = taf
        sys.modules.update({"torchaudio": ta, "torchaudio.functional": taf,
                            "torchaudio.functional.functional": taff})


def install_reference_gpt():
    """install_reference + stubs for the vendored-HF GPT import chain.

    The reference vendors transformers ~4.3x internals
    (`indextts/gpt/transformers_*.py`); the installed transformers 4.57 has
    dropped several private names those modules import.  They are only touched
    by generate-time code paths we never call in tests.
    """
    install_reference()
    import importlib

    def patch(mod_name, names, value=None):
        mod = importlib.import_module(mod_name)
        for n in names:
            if not hasattr(mod, n):
                setattr(mod, n, value if value is not None else type(n, (), {}))

    patch("transformers.cache_utils", ["QuantizedCacheConfig"])
    patch("transformers.generation.candidate_generator",
          ["_crop_past_key_values", "_prepare_attention_mask",
           "_prepare_token_type_ids"], value=lambda *a, **k: None)
    patch("transformers.generation.configuration_utils",
          ["NEED_SETUP_CACHE_CLASSES_MAPPING", "QUANT_BACKEND_CLASSES_MAPPING"],
          value={})
    patch("transformers.modeling_utils", ["SequenceSummary"])
    # vendored generate reads GenerationConfig attrs removed in 4.5x
    import transformers.generation.configuration_utils as gcu
    for attr in ("forced_decoder_ids",):
        if not hasattr(gcu.GenerationConfig, attr):
            setattr(gcu.GenerationConfig, attr, None)


def install_reference_s2mel():
    """install_reference + stubs for the s2mel import chain (munch,
    audiotools/argbind pulled in by the dead dac package)."""
    install_reference()
    import torch

    if "munch" not in sys.modules:
        munch = _stub_module("munch")

        class Munch(dict):
            def __getattr__(self, k):
                return self[k]

        munch.Munch = Munch
        sys.modules["munch"] = munch
    if "audiotools" not in sys.modules:
        class BaseModel(torch.nn.Module):
            INTERN: list = []
            EXTERN: list = []

        class _Empty:
            pass

        at = _stub_module("audiotools")
        ml = _stub_module("audiotools.ml")
        ml.BaseModel = BaseModel
        ml.Accelerator = _Empty
        at.AudioSignal = _Empty
        at.STFTParams = _Empty
        at.ml = ml
        sys.modules.update({"audiotools": at, "audiotools.ml": ml})
    if "argbind" not in sys.modules:
        ab = _stub_module("argbind")
        ab.bind = lambda *a, **k: (lambda f: f)
        sys.modules["argbind"] = ab


class RefArgs:
    """Attribute bag standing in for the reference's OmegaConf node."""

    def __init__(self, **kw):
        self.__dict__.update(kw)

    def __contains__(self, k):
        return k in self.__dict__
