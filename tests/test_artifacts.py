"""Artifact store round-trip + engine loading."""

import numpy as np

from voice_tts_tpu.utils.artifacts import (
    load_artifacts, save_artifacts, split_matrix_groups,
)


def test_artifact_roundtrip(tmp_path):
    import sys
    sys.path.insert(0, "tests")
    from test_engine import _tiny_engine

    from voice_tts_tpu.engine import TTSEngine
    from voice_tts_tpu.text.sp_model import Piece, PieceType, serialize_model

    engine = _tiny_engine()
    bpe = serialize_model([Piece("<unk>", 0.0, PieceType.UNKNOWN),
                           Piece("a", -1.0)])
    extras = {
        "w2v_mean": np.asarray(engine.w2v_mean),
        "w2v_std": np.asarray(engine.w2v_std),
        "emo_matrix": [np.asarray(m) for m in engine.emo_matrix],
        "spk_matrix": [np.asarray(m) for m in engine.spk_matrix],
    }
    save_artifacts(str(tmp_path), engine.cfg, engine.params, extras, bpe)

    cfg, params, loaded_extras, bpe2 = load_artifacts(str(tmp_path))
    assert cfg.to_dict() == engine.cfg.to_dict()
    assert set(params) == set(engine.params)
    assert bpe2 == bpe
    np.testing.assert_array_equal(loaded_extras["w2v_mean"],
                                  np.asarray(engine.w2v_mean))
    assert len(loaded_extras["emo_matrix"]) == len(engine.emo_matrix)

    # param leaves identical
    import jax
    for fam in params:
        a = jax.tree.leaves(params[fam])
        b = jax.tree.leaves(engine.params[fam])
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # engine loads from the directory (hash tokenizer path since the toy
    # bpe lacks coverage)
    engine2 = TTSEngine.from_artifacts(str(tmp_path))
    assert engine2.cfg.gpt.model_dim == engine.cfg.gpt.model_dim


def test_split_matrix_groups():
    mat = np.arange(20).reshape(10, 2)
    groups = split_matrix_groups(mat, (3, 2, 5))
    assert [g.shape[0] for g in groups] == [3, 2, 5]
    np.testing.assert_array_equal(np.concatenate(groups), mat)
