"""FULL-MODEL golden parity: jax MDTModel vs a torch oracle of the reference
forward composition.

fairseq/torch_geometric are unavailable here, so the reference cannot be run
directly; instead this test *restates the reference forward semantics*
(mDT/src/modules/multigraphormer_graph_encoder.py:310-464,
multi_graphormer_fusion_layer.py:29-71, graphormer_layers.py:39-110,
graphormer_graph_encoder_layer.py:103-142, multihead_attention.py:134-203,
multi_modal_discussion_transformer.py:256-276) as an explicit torch oracle
built from the SAME HF modules the reference consumes, with dynamic shapes
and boolean indexing exactly as the reference does them. The jax model runs
on the static-capacity collated batch; the oracle runs on the
reference-format dynamic batch; per-node logits and the global embedding
must match element-wise.

Every weight is shared: HF towers are imported into the jax params via
utils/hf_import, and the jax graph-path params are exported into the oracle.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from multimodaldiscussiontransformer_tpu.core.config import tiny_model_config
from multimodaldiscussiontransformer_tpu.data.collator import collate
from multimodaldiscussiontransformer_tpu.data.synthetic import synthetic_batch_items
from multimodaldiscussiontransformer_tpu.models.mdt import MDTModel
from multimodaldiscussiontransformer_tpu.utils import hf_import as hfi

IMG = (3, 32, 32)
NEG = float("-inf")


def small_hf():
    bert_cfg = transformers.BertConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=4,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64, hidden_act="gelu",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        num_labels=2,
    )
    vit_cfg = transformers.ViTConfig(
        image_size=32, patch_size=16, num_channels=3, hidden_size=64,
        num_hidden_layers=4, num_attention_heads=4, intermediate_size=128,
        hidden_act="gelu", hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    bert = transformers.BertForSequenceClassification(bert_cfg).eval()
    vit = transformers.ViTModel(vit_cfg).eval()
    return bert, vit


def t2n(x):
    return x.detach().numpy()


def jax_kernel_to_torch_linear(linear, params):
    linear.weight.data = torch.tensor(np.asarray(params["kernel"]).T.copy())
    linear.bias.data = torch.tensor(np.asarray(params["bias"]).copy())


class TorchGraphLayer(torch.nn.Module):
    """Post-LN biased-attention block with weights exported from one jax
    GraphormerGraphEncoderLayer (graphormer_graph_encoder_layer.py:103-142)."""

    def __init__(self, p, d, h):
        super().__init__()
        self.h, self.d = h, d
        self.q = torch.nn.Linear(d, d)
        self.k = torch.nn.Linear(d, d)
        self.v = torch.nn.Linear(d, d)
        self.o = torch.nn.Linear(d, d)
        jax_kernel_to_torch_linear(self.q, p["self_attn"]["q_proj"])
        jax_kernel_to_torch_linear(self.k, p["self_attn"]["k_proj"])
        jax_kernel_to_torch_linear(self.v, p["self_attn"]["v_proj"])
        jax_kernel_to_torch_linear(self.o, p["self_attn"]["out_proj"])
        self.ln1 = torch.nn.LayerNorm(d)
        self.ln1.weight.data = torch.tensor(np.asarray(p["self_attn_layer_norm"]["scale"]).copy())
        self.ln1.bias.data = torch.tensor(np.asarray(p["self_attn_layer_norm"]["bias"]).copy())
        self.fc1 = torch.nn.Linear(d, p["fc1"]["kernel"].shape[1])
        self.fc2 = torch.nn.Linear(p["fc2"]["kernel"].shape[0], d)
        jax_kernel_to_torch_linear(self.fc1, p["fc1"])
        jax_kernel_to_torch_linear(self.fc2, p["fc2"])
        self.ln2 = torch.nn.LayerNorm(d)
        self.ln2.weight.data = torch.tensor(np.asarray(p["final_layer_norm"]["scale"]).copy())
        self.ln2.bias.data = torch.tensor(np.asarray(p["final_layer_norm"]["bias"]).copy())

    def forward(self, x, bias, key_pad):
        # x: (B, S, D); bias (B, H, S, S); key_pad (B, S) bool True=pad
        b, s, d = x.shape
        h = self.h
        dh = d // h
        residual = x
        q = self.q(x).view(b, s, h, dh).permute(0, 2, 1, 3) * dh ** -0.5
        k = self.k(x).view(b, s, h, dh).permute(0, 2, 1, 3)
        v = self.v(x).view(b, s, h, dh).permute(0, 2, 1, 3)
        scores = q @ k.transpose(-1, -2) + bias
        scores = scores.masked_fill(key_pad[:, None, None, :], NEG)
        probs = torch.softmax(scores.float(), dim=-1).to(x.dtype)
        ctx = (probs @ v).permute(0, 2, 1, 3).reshape(b, s, d)
        x = self.ln1(residual + self.o(ctx))
        residual = x
        x = self.fc2(torch.nn.functional.gelu(self.fc1(x)))
        return self.ln2(residual + x)


class TorchOracle:
    """The reference forward, batch-first, dynamic shapes."""

    def __init__(self, bert, vit, cfg, jax_params):
        self.cfg = cfg
        n_split = cfg.num_fusion_layers + 1
        # tower split (multigraphormer_graph_encoder.py:249-260)
        self.bert_bottom = bert.bert.encoder.layer[: 4 - n_split]
        self.bert_emb = bert.bert.embeddings
        self.bert_fusion = bert.bert.encoder.layer[4 - n_split :]
        self.vit_emb = vit.embeddings
        self.vit_bottom = vit.encoder.layer[: 4 - n_split]
        self.vit_fusion = vit.encoder.layer[4 - n_split :]
        self.vit_final_ln = vit.layernorm  # the truncated-model quirk
        self.pooler = bert.bert.pooler
        self.classifier = bert.classifier

        p = jax_params["params"]
        ge = p["graph_encoder"]
        self.bottle_neck = torch.tensor(np.asarray(ge["bottle_neck"]).copy())
        gnf = ge["graph_node_feature"]
        self.in_deg = torch.tensor(np.asarray(gnf["in_degree_encoder"]).copy())
        self.out_deg = torch.tensor(np.asarray(gnf["out_degree_encoder"]).copy())
        self.in_deg[0] = 0  # padding_idx=0 semantics
        self.out_deg[0] = 0
        self.graph_token = torch.tensor(np.asarray(gnf["graph_token"]).copy())
        gab = ge["graph_attn_bias"]
        self.spatial = torch.tensor(np.asarray(gab["spatial_pos_encoder"]).copy())
        self.spatial[0] = 0
        self.virtual_t = torch.tensor(
            np.asarray(gab["graph_token_virtual_distance"]).copy()
        )
        self.emb_ln = torch.nn.LayerNorm(cfg.encoder_embed_dim)
        self.emb_ln.weight.data = torch.tensor(np.asarray(ge["emb_layer_norm"]["scale"]).copy())
        self.emb_ln.bias.data = torch.tensor(np.asarray(ge["emb_layer_norm"]["bias"]).copy())
        # the reference's second-to-last stack is dead (constructed, never
        # run, receives no grads — SURVEY.md §7); the jax model creates no
        # params for it, so index by the stacks that exist
        stack_ids = sorted(
            int(k.split("_")[-1]) for k in ge if k.startswith("graph_stack_")
        )
        self.graph_stacks = {
            i: [
                TorchGraphLayer(
                    ge[f"graph_stack_{i}"][f"layer_{j}"],
                    cfg.encoder_embed_dim,
                    cfg.encoder_attention_heads,
                )
                for j in range(cfg.num_graph_stack)
            ]
            for i in stack_ids
        }
        self.last_stack_id = max(stack_ids)

    def fusion_step(self, k, bert_out, vit_out, bn, ext_mask, img_idx):
        """One GraphFusionLayer (multi_graphormer_fusion_layer.py:29-71)."""
        nbn = self.cfg.num_bottleneck_tokens
        bert_in = torch.cat([bn, bert_out], dim=1)
        bert_full = self.bert_fusion[k](bert_in, ext_mask)[0]
        bert_out = bert_full[:, nbn:]
        bn_out = bert_full[:, :nbn]
        if vit_out is not None:
            vit_in = torch.cat([bn[img_idx], vit_out], dim=1)
            vit_full = self.vit_fusion[k](vit_in)
            if isinstance(vit_full, tuple):
                vit_full = vit_full[0]
            vit_out = vit_full[:, nbn:]
            bn_out[img_idx] = (vit_full[:, :nbn] + bn_out[img_idx]) / 2
        return bert_out, vit_out, bn_out

    @torch.no_grad()
    def forward(self, ref):
        cfg = self.cfg
        nbn = cfg.num_bottleneck_tokens
        mask = ref["x_token_mask"]  # (B, Nmax) bool
        ids = ref["x"][mask]
        am = ref["x_attention_mask"][mask]
        tt = ref["x_token_type_ids"][mask]

        # bottom towers (ref 321-337)
        h = self.bert_emb(input_ids=ids, token_type_ids=tt)
        ext = (1.0 - am[:, None, None, :].float()) * torch.finfo(torch.float32).min
        for lyr in self.bert_bottom:
            h = lyr(h, ext)[0]
        bert_out = h
        vit_out = None
        if ref["x_images"] is not None:
            v = self.vit_emb(ref["x_images"])
            for lyr in self.vit_bottom:
                v = lyr(v)
                if isinstance(v, tuple):
                    v = v[0]
            vit_out = self.vit_final_ln(v)  # truncated-model early final LN

        n_nodes = bert_out.shape[0]
        bn = self.bottle_neck[None].repeat(n_nodes, 1, 1)
        fusion_am = torch.cat([torch.ones(n_nodes, nbn), am.float()], dim=1)
        ext_mask = (1.0 - fusion_am[:, None, None, :]) * torch.finfo(torch.float32).min
        img_idx = ref["x_image_indexes"]

        bert_out, vit_out, bn = self.fusion_step(0, bert_out, vit_out, bn, ext_mask, img_idx)

        # graph grid scatter (ref 363-371)
        bsz, nmax = mask.shape
        d = cfg.encoder_embed_dim
        grid = torch.zeros(bsz, nmax, d)
        grid[mask] = bn[:, 0, :]

        pad = ~mask
        key_pad = torch.cat([torch.zeros(bsz, 1, dtype=torch.bool), pad], dim=1)

        # node features + graph token (graphormer_layers.py:39-50)
        feats = grid + self.in_deg[ref["in_degree"]] + self.out_deg[ref["out_degree"]]
        x = torch.cat([self.graph_token[None].repeat(bsz, 1, 1), feats], dim=1)

        # attention bias w/ double-add quirk (graphormer_layers.py:86-110)
        template = ref["attn_bias"]  # (B, N+1, N+1)
        hheads = cfg.encoder_attention_heads
        g = template[:, None].repeat(1, hheads, 1, 1)
        sp = self.spatial[ref["spatial_pos"]].permute(0, 3, 1, 2)
        g[:, :, 1:, 1:] = g[:, :, 1:, 1:] + sp
        t = self.virtual_t.view(1, hheads, 1)
        g[:, :, 1:, 0] = g[:, :, 1:, 0] + t
        g[:, :, 0, :] = g[:, :, 0, :] + t
        g = g + template[:, None]

        x = self.emb_ln(x)

        # interleave: zip(layers, fusion[1:]) then layers[-1] (ref 413-446)
        n_fusion = len(self.bert_fusion)
        for i in range(n_fusion - 1):
            for lyr in self.graph_stacks[i]:
                x = lyr(x, g, key_pad)
            bn[:, 0, :] = x[:, 1:][mask]
            bert_out, vit_out, bn = self.fusion_step(
                i + 1, bert_out, vit_out, bn, ext_mask, img_idx
            )
            tail = x[:, 1:].clone()
            tail[mask] = bn[:, 0, :]
            x = torch.cat([x[:, :1], tail], dim=1)
        for lyr in self.graph_stacks[self.last_stack_id]:
            x = lyr(x, g, key_pad)

        global_emb = x[:, 0, :]
        # head (multi_modal_discussion_transformer.py:256-276)
        text_logits = self.classifier(self.pooler(bert_out))
        graph_logits = self.classifier(self.pooler(bn))
        return (text_logits + graph_logits) / 2, global_emb


def batch_to_reference_format(batch):
    """Static-capacity Batch -> the reference's dynamic per-batch-max format
    (collator.py:69-179)."""
    bsz, nmax = batch.in_degree.shape
    t = batch.input_ids.shape[1]
    x = np.zeros((bsz, nmax, t), np.int64)
    am = np.zeros((bsz, nmax, t), np.int64)
    tt = np.zeros((bsz, nmax, t), np.int64)
    mask = np.zeros((bsz, nmax), bool)
    img_flags = []
    for slot in range(batch.node_capacity):
        if not batch.node_mask[slot]:
            continue
        g, pos = batch.node_graph[slot], batch.node_pos[slot]
        x[g, pos] = batch.input_ids[slot]
        am[g, pos] = batch.attention_mask[slot]
        tt[g, pos] = batch.token_type_ids[slot]
        mask[g, pos] = True
    # flat image flags in node order
    img_nodes = set(batch.image_node[batch.image_mask].tolist())
    for slot in range(batch.node_capacity):
        if batch.node_mask[slot]:
            img_flags.append(slot in img_nodes)
    images = batch.images[batch.image_mask]
    return {
        "x": torch.tensor(x),
        "x_attention_mask": torch.tensor(am),
        "x_token_type_ids": torch.tensor(tt),
        "x_token_mask": torch.tensor(mask),
        "x_images": torch.tensor(images) if len(images) else None,
        "x_image_indexes": torch.tensor(np.asarray(img_flags, bool)),
        "attn_bias": torch.tensor(batch.attn_bias),
        "spatial_pos": torch.tensor(batch.spatial_pos.astype(np.int64)),
        "in_degree": torch.tensor(batch.in_degree.astype(np.int64)),
        "out_degree": torch.tensor(batch.out_degree.astype(np.int64)),
    }


@pytest.mark.parametrize("image_prob", [0.0, 0.6])
def test_full_model_logit_parity(image_prob):
    cfg = tiny_model_config()
    bert, vit = small_hf()
    bert_sd = {k: v.numpy() for k, v in bert.state_dict().items()}
    vit_sd = {"vit." + k: v.numpy() for k, v in vit.state_dict().items()}

    items = synthetic_batch_items(
        3, seed=11, seq_len=12, vocab_size=128, image_shape=IMG,
        min_nodes=2, max_nodes=7, image_prob=image_prob,
    )
    batch = collate(items, spatial_pos_max=5, image_shape=IMG)
    jb = {k: jnp.asarray(v) for k, v in batch.asdict().items()}

    model = MDTModel(cfg)
    params = jax.device_get(model.init(jax.random.PRNGKey(0), jb, deterministic=True))
    params = hfi.import_towers(params, cfg, bert_sd, vit_sd)
    out = model.apply(params, jb, deterministic=True)

    oracle = TorchOracle(bert, vit, cfg, params)
    ref_batch = batch_to_reference_format(batch)
    ref_logits, ref_global = oracle.forward(ref_batch)

    jax_logits = np.asarray(out.logits)[batch.node_mask]
    np.testing.assert_allclose(
        jax_logits, t2n(ref_logits), rtol=5e-4, atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.global_embedding), t2n(ref_global), rtol=5e-4, atol=5e-5
    )
