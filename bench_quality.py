"""On-TPU recall-lift evidence: noise-hardened synthetic scene at the
full reference config (4096-pt clouds, quadruplet + patch losses).

Run on the real chip: ``python bench_quality.py`` (~8 min: one eval
compile + 12 epochs x 24 steps at ~6-9 s/epoch). Measured round 2:
random-init recall@1 25.0 -> trained 97.9 after 288 steps (100.0 in a
run without the epoch-10 LR decay) — the training loop LEARNS on
hardware, complementing the CPU-mesh quality tests
(tests/test_train.py::TestTrainingQuality) and the easy-scene CLI
pipeline run recorded in BASELINE.md."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np
import jax
jax.config.update("jax_default_matmul_precision", "float32")
import jax.numpy as jnp
from __graft_entry__ import FULL_PARAM
from patchaugnet_tpu import data, train
from patchaugnet_tpu.models import get_model

cfg = dict(
    FULL_PARAM,
    TRAIN_BATCH_SIZE=2, TRAIN_POSITIVES_PER_QUERY=2,
    TRAIN_NEGATIVES_PER_QUERY=6,
    BASE_LEARNING_RATE=5e-4, MOMENTUM=0.9, OPTIMIZER="adam",
    MAX_EPOCH=12, LEARNING_RATE_DECAY="step", MARGIN_1=0.5, MARGIN_2=0.2,
    LOSS_FUNCTION="quadruplet", LOSS_LAZY=True,
    TRIPLET_USE_BEST_POSITIVES=False, LOSS_IGNORE_ZERO_BATCH=False,
    A2B_MAX_ROWS=2048, A2B_MAX_PAIRS=16,
    use_hard_negative_patch_mining=True,
)


def make_ds(for_training):
    pr = data.PlaceRecognitionDataset(
        "synthetic", for_training,
        num_pos=cfg["TRAIN_POSITIVES_PER_QUERY"],
        num_neg=cfg["TRAIN_NEGATIVES_PER_QUERY"],
        load_overlap_indices=True,
    )
    pr.scene.create_synthetic(n_trips=2, n_per_trip=24, num_points=4096)
    r = np.random.RandomState(7)
    pr.scene._clouds = pr.scene._clouds + (
        r.randn(*pr.scene._clouds.shape).astype(np.float32) * 0.35
    )
    pr.scene._pc_cache.clear()
    pr.scene._pc_order.clear()
    return pr


def main():
    train_ds, test_ds = make_ds(True), make_ds(False)
    model = get_model("patch_aug_net", cfg)
    tuple_size = 1 + cfg["TRAIN_POSITIVES_PER_QUERY"] + cfg["TRAIN_NEGATIVES_PER_QUERY"] + 1
    x = jnp.zeros((cfg["TRAIN_BATCH_SIZE"] * tuple_size, 4096, 3))
    state = train.create_train_state(
        model, jax.random.PRNGKey(0), x, cfg, init_kwargs={"with_patches": True},
        steps_per_epoch=24,  # 48 queries / 2 tuples: step decay fires at epoch 10
    )
    forward = train.build_forward_fn(model, cfg)


    def recall1(state):
        out = train.evaluate(state.variables, forward, test_ds, top_k=5, batch_size=12)
        return out.get("recall_at_1", 0.0)


    t0 = time.perf_counter()
    r_init = recall1(state)
    print(f"init recall@1 {r_init:.1f} ({time.perf_counter()-t0:.0f}s)", flush=True)
    step = train.build_train_step(model, cfg)
    center_fn = train.build_center_fn(cfg["SAMPLING"][0])
    for epoch in range(12):
        t0 = time.perf_counter()
        s = train.train_one_epoch(
            state, step, train_ds, cfg, epoch, center_fn=center_fn
        )
        state = s.pop("state")
        print(
            f"epoch {epoch}: total {s['total']:.3f} pr {s['place_recognition']:.3f} "
            f"({s['batches']} steps, {time.perf_counter()-t0:.0f}s)",
            flush=True,
        )
    r_final = recall1(state)
    print(f"TRAINED recall@1 {r_final:.1f} (init {r_init:.1f})", flush=True)


if __name__ == "__main__":
    main()
