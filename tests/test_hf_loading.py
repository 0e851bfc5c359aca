"""`from_huggingface` weight-mapping tests (`models/transformer.py`).

The reference runs on real pretrained `bert-base-uncased` / `roberta-base`
(``src/contrastor/contrastive_module.py:32-34``, ``src/QA/model.py:13``).
This environment has no network egress, so these tests construct tiny
RANDOM checkpoints through the transformers library's own serialization
(config.json + safetensors via ``save_pretrained``) and assert that the
HF->pytree mapping produces a JAX forward matching torch's
``last_hidden_state`` — covering weight transposition, layernorm naming,
token-type embeddings, attention masking, and the RoBERTa position offset.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from ircl_tpu.models.transformer import from_huggingface, transformer_apply


def _rand_inputs(rng, vocab, B=3, L=12, pad_id=0):
    """Right-padded batch: ids from [3, vocab) with a padded tail."""
    lens = rng.integers(L // 2, L + 1, size=B)
    ids = np.full((B, L), pad_id, np.int32)
    for b, n in enumerate(lens):
        ids[b, :n] = rng.integers(3, vocab, size=n)
    mask = (np.arange(L)[None, :] < lens[:, None]).astype(np.float32)
    types = np.zeros((B, L), np.int32)
    types[:, L // 2 :] = 1  # exercise token-type embeddings
    return ids, mask, types, lens


def _compare(cfg, params, hf_model, ids, mask, types, lens, atol):
    ours = np.asarray(
        transformer_apply(
            params, cfg, np.asarray(ids), np.asarray(mask), np.asarray(types)
        )
    )
    hf_model.eval()
    with torch.no_grad():
        theirs = hf_model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask, dtype=torch.long),
            token_type_ids=torch.tensor(types, dtype=torch.long),
        ).last_hidden_state.numpy()
    # pad rows are garbage by design (downstream pooling masks them);
    # every REAL position must match
    for b, n in enumerate(lens):
        np.testing.assert_allclose(
            ours[b, :n], theirs[b, :n], atol=atol, rtol=0
        )


def test_from_huggingface_bert_matches_torch_forward(tmp_path):
    from transformers import BertConfig, BertModel

    hc = BertConfig(
        vocab_size=120,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=128,
        max_position_embeddings=32,
        type_vocab_size=2,
        hidden_act="gelu",
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(7)
    model = BertModel(hc)
    model.save_pretrained(tmp_path)  # config.json + model.safetensors

    cfg, params = from_huggingface(str(tmp_path))
    assert cfg.hidden == 64 and cfg.layers == 2 and cfg.position_offset == 0
    assert params["tok_emb"].shape == (120, 64)

    rng = np.random.default_rng(3)
    ids, mask, types, lens = _rand_inputs(rng, 120)
    _compare(cfg, params, model, ids, mask, types, lens, atol=2e-4)


def test_from_huggingface_roberta_matches_torch_forward(tmp_path):
    from transformers import RobertaConfig, RobertaModel

    hc = RobertaConfig(
        vocab_size=120,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=128,
        # HF roberta convention: includes the +2 padding_idx offset
        max_position_embeddings=34,
        type_vocab_size=1,
        pad_token_id=1,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(11)
    model = RobertaModel(hc)
    model.save_pretrained(tmp_path)

    cfg, params = from_huggingface(str(tmp_path))
    assert cfg.position_offset == 2
    assert cfg.max_positions == 32

    # roberta computes position ids from input_ids != pad_id (1): the real
    # prefix gets positions 2..n+1, which is our arange + position_offset
    rng = np.random.default_rng(5)
    ids, mask, _, lens = _rand_inputs(rng, 120, pad_id=1)
    types = np.zeros_like(ids)  # roberta has a single type embedding
    _compare(cfg, params, model, ids, mask, types, lens, atol=2e-4)


def test_from_huggingface_missing_cache_raises(tmp_path):
    with pytest.raises(Exception):
        from_huggingface(str(tmp_path / "nonexistent-model"))
