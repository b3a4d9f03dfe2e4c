"""Model-level tests: shapes, numerics of the CAPL head, training smoke test."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfs3dseg_gws_tpu.models import DGCNN, DGCNNSeg, GWCAPL, SelfAttention
from gfs3dseg_gws_tpu.models.layers import cross_entropy

B, N, CIN = 2, 64, 9
NUM_GW = 12
CLASSES, BASE = 13, 7


def tiny_capl(**kw):
    defaults = dict(classes=CLASSES, base_num=BASE, num_gw=NUM_GW,
                    edgeconv_widths=((8, 8), (8, 8), (8, 8)),
                    mlp_widths=(16, 16), base_widths=(8, 8), output_dim=8,
                    main_dim=16, k=5, use_pallas=False)
    defaults.update(kw)
    return GWCAPL(**defaults)


@pytest.fixture(scope="module")
def capl_setup():
    model = tiny_capl()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, CIN))
    y = jax.random.randint(jax.random.PRNGKey(2), (B, N), 0, BASE + 1)
    gp = jax.random.normal(jax.random.PRNGKey(3), (NUM_GW, 24))
    variables = model.init({"params": rng, "dropout": rng, "fake": rng},
                           x, y, gp, train=True)
    return model, variables, x, y, gp


class TestBackbone:
    def test_dgcnn_shapes(self):
        model = DGCNN(edgeconv_widths=((8, 8), (8, 8), (8, 8)),
                      mlp_widths=(16, 16), k=5, use_pallas=False)
        x = jnp.ones((B, N, CIN))
        vars_ = model.init(jax.random.PRNGKey(0), x)
        (edges, out), _ = model.apply(vars_, x, True,
                                      mutable=["batch_stats"])
        assert len(edges) == 3
        assert all(e.shape == (B, N, 8) for e in edges)
        assert out.shape == (B, N, 16)

    def test_attention_shape_and_rowsum(self):
        model = SelfAttention(out_channels=8)
        x = jax.random.normal(jax.random.PRNGKey(0), (B, N, 16))
        vars_ = model.init(jax.random.PRNGKey(1), x)
        y = model.apply(vars_, x)
        assert y.shape == (B, N, 8)

    def test_dgcnnseg_logits(self):
        model = DGCNNSeg(num_classes=8,
                         edgeconv_widths=((8, 8), (8, 8), (8, 8)),
                         mlp_widths=(16, 16), k=5, use_pallas=False)
        x = jax.random.normal(jax.random.PRNGKey(0), (B, N, CIN))
        vars_ = model.init(jax.random.PRNGKey(1), x)
        logits, feat = model.apply(vars_, x, False, True)
        assert logits.shape == (B, N, 8)
        assert feat.shape == (B, N, 24)   # EdgeConv1-3 concat


class TestCaplNumerics:
    def test_get_pred_is_scaled_cosine(self, capl_setup):
        model, variables, x, y, gp = capl_setup
        feat = jax.random.normal(jax.random.PRNGKey(5), (B, N, 16))
        proto = jax.random.normal(jax.random.PRNGKey(6), (CLASSES, 16))
        pred = model.apply(variables, feat, proto, method="get_pred")
        fn = np.asarray(feat) / np.linalg.norm(np.asarray(feat), axis=-1,
                                               keepdims=True)
        pn = np.asarray(proto) / np.linalg.norm(np.asarray(proto), axis=-1,
                                                keepdims=True)
        ref = 10.0 * np.einsum("bnc,kc->bnk", fn, pn)
        np.testing.assert_allclose(np.asarray(pred), ref, rtol=1e-4, atol=1e-5)

    def test_get_pred_bg_prepended(self, capl_setup):
        model, variables, x, y, gp = capl_setup
        feat = jax.random.normal(jax.random.PRNGKey(5), (B, N, 16))
        proto = jax.random.normal(jax.random.PRNGKey(6), (CLASSES, 16))
        pred = model.apply(variables, feat, proto, True, method="get_pred")
        assert pred.shape == (B, N, CLASSES + 1)

    def test_post_refine_matches_oracle(self, capl_setup):
        model, variables, x, y, gp = capl_setup
        feat = jax.random.normal(jax.random.PRNGKey(7), (B, N, 16))
        proto = jax.random.normal(jax.random.PRNGKey(8), (CLASSES, 16))
        got = model.apply(variables, proto, feat, method="post_refine_proto")

        # numpy oracle of eqn.6 (reference capl.py:245-268)
        def nrm(a):
            return a / np.maximum(
                np.linalg.norm(a, axis=-1, keepdims=True), 1e-12)
        f = np.asarray(feat); p = np.asarray(proto)
        pred = 10.0 * np.einsum("bnc,kc->bnk", nrm(f), nrm(p))
        e = np.exp(pred - pred.max(axis=1, keepdims=True))
        sm = e / e.sum(axis=1, keepdims=True)        # softmax over POINTS
        pp = np.einsum("bnk,bnc->bkc", sm, f)
        w = np.sum(nrm(pp) * nrm(p)[None], axis=-1, keepdims=True)
        w = w * (w > 0)
        ref = w * pp + (1 - w) * p[None]
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-3, atol=1e-4)

    def test_generate_fake_proto(self, capl_setup):
        model, variables, x, y, gp = capl_setup
        feats = jax.random.normal(jax.random.PRNGKey(9), (B, N, 16))
        labels = jnp.asarray(
            np.random.default_rng(0).integers(0, 5, (B, N)))  # classes 0..4
        proto = variables["params"]["main_proto"]
        new_proto, fake = model.apply(
            variables, feats, labels, proto, jax.random.PRNGKey(10),
            method="generate_fake_proto")
        fake = np.asarray(fake)
        present = np.unique(np.asarray(labels))
        present = present[present > 0]
        assert fake.sum() == len(present) // 2
        # fake rows only among present classes (row c <-> label c+1)
        assert all((c + 1) in present for c in np.nonzero(fake)[0])
        # non-fake rows are l2-normalised main_proto
        pn = np.asarray(proto) / np.linalg.norm(np.asarray(proto), axis=-1,
                                                keepdims=True)
        for c in range(CLASSES):
            if fake[c] == 0:
                np.testing.assert_allclose(np.asarray(new_proto)[c], pn[c],
                                           rtol=1e-5)
            else:
                f = np.asarray(feats)
                f = f / np.linalg.norm(f, axis=-1, keepdims=True)
                m = (np.asarray(labels) == c + 1)
                ref = (f * m[..., None]).sum((0, 1)) / (m.sum() + 1e-12)
                np.testing.assert_allclose(np.asarray(new_proto)[c], ref,
                                           rtol=1e-3, atol=1e-5)

    def test_gp_weight(self, capl_setup):
        model, variables, x, y, gp = capl_setup
        coding = jnp.asarray(
            np.random.default_rng(1).integers(0, 2, (CLASSES, NUM_GW))
            .astype(np.float32))
        gw = jax.nn.one_hot(
            jnp.asarray(np.random.default_rng(2).integers(0, NUM_GW, (B, N))),
            NUM_GW)
        weight, acc, nacc = model.apply(
            variables, coding, gw, 1.2, y, method="gp_weight")
        w = np.asarray(weight)
        score = np.einsum("kw,bnw->bnk", np.asarray(coding), np.asarray(gw))
        np.testing.assert_allclose(w, np.where(score == 1, 1.2, 1.0))


class TestTraining:
    def test_forward_train_and_eval(self, capl_setup):
        model, variables, x, y, gp = capl_setup
        (pred, loss), updates = model.apply(
            variables, x, y, gp, True,
            rngs={"dropout": jax.random.PRNGKey(0),
                  "fake": jax.random.PRNGKey(1)},
            mutable=["batch_stats"])
        assert pred.shape == (B, N)
        assert np.isfinite(float(loss))

        gened = jax.random.normal(jax.random.PRNGKey(3), (CLASSES, 16))
        base_coding = jnp.ones((BASE, NUM_GW))
        novel_coding = jnp.ones((CLASSES - BASE, NUM_GW))
        logits, gp_acc, gp_nacc = model.apply(
            variables, x, gp, gened, base_coding, novel_coding, y,
            method="evaluate")
        assert logits.shape == (B, N, CLASSES)

    def test_loss_decreases(self, capl_setup):
        import optax
        model, variables, x, y, gp = capl_setup
        params = variables["params"]
        bstats = variables["batch_stats"]
        tx = optax.adam(1e-3)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, bstats, opt_state, rng):
            def loss_fn(p):
                (pred, loss), upd = model.apply(
                    {"params": p, "batch_stats": bstats}, x, y, gp, True,
                    rngs={"dropout": rng, "fake": rng},
                    mutable=["batch_stats"])
                return loss, upd["batch_stats"]
            (loss, new_bstats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_bstats, opt_state, loss

        losses = []
        for i in range(8):
            params, bstats, opt_state, loss = step(
                params, bstats, opt_state, jax.random.PRNGKey(i))
            losses.append(float(loss))
        assert losses[-1] < losses[0]

    def test_cross_entropy_ignore_index(self):
        logits = jnp.asarray([[0.0, 10.0], [10.0, 0.0]])
        labels = jnp.asarray([1, 255])
        first_only = cross_entropy(logits[:1], jnp.asarray([1]))
        masked = cross_entropy(logits, labels, ignore_index=255)
        np.testing.assert_allclose(float(masked), float(first_only), rtol=1e-5)
