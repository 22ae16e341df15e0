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
