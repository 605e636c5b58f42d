"""End-to-end eval-parity fixture: run the *reference* eval.py pipeline on
synthetic npz data with the small_strided fixture weights, capture its printed
metrics, and save them for tests/test_eval_parity.py.

Run once (after make_reference_fixtures.py and make_generator_fixtures.py):
    python tools/make_eval_fixture.py
"""

import contextlib
import io
import json
import os
import re
import sys

os.environ["TF_USE_LEGACY_KERAS"] = "1"
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE_DIR = os.path.join(REPO, "tests", "fixtures")
SYNTH_DIR = os.path.join(FIXTURE_DIR, "synth")

# Small config matching the small_strided fixture weights
EVAL_CONFIG = {
    "ARCH": "UpliftUpsampleTransformer",
    "SEQUENCE_LENGTH": 9,
    "SEQUENCE_STRIDE": 5,
    "NUM_KEYPOINTS": 17,
    "SPATIAL_EMBED_DIM": 16,
    "TEMPORAL_EMBED_DIM": 32,
    "SPATIAL_TRANSFORMER_BLOCKS": 2,
    "TEMPORAL_TRANSFORMER_BLOCKS": 2,
    "STRIDES": [3, 3],
    "PADDINGS": [[0, 0], [0, 0]],
    "NUM_HEADS": 4,
    "MLP_RATIO": 2,
    "QKV_BIAS": True,
    "DROP_RATE": 0.0,
    "ATTENTION_DROP_RATE": 0.0,
    "DROP_PATH_RATE": [0.0, 0.0, 0.0],
    "OUTPUT_BN": False,
    "USE_REFINE": False,
    "TOKEN_MASK_RATE": 0.0,
    "LEARNABLE_MASKED_TOKEN": False,
    "MASK_STRIDE": [5, 10, 20],
    "FIRST_STRIDED_TOKEN_ATTENTION_LAYER": 1,
    "BATCH_SIZE": 64,
    "DATASET_TEST_3D_SUBSAMPLE_STEP": 1,
    "EVAL_FLIP": True,
    "TEST_STRIDED_EVAL": True,
    "PADDING_TYPE": "copy",
    "ROOT_KEYTPOINT": 6,
}


def patch_keras():
    from tf_keras.src.engine.base_layer import Layer
    orig = Layer.__init__

    def patched(self, trainable=True, name=None, dtype=None, dynamic=False, **kwargs):
        if not isinstance(trainable, bool):
            trainable = True
        orig(self, trainable=trainable, name=name, dtype=dtype, dynamic=dynamic, **kwargs)

    Layer.__init__ = patched

    # Shim the TF-2.4 `tensorflow.python.keras` internals the reference's
    # weight_io imports, backed by their tf_keras equivalents.
    import types
    from tf_keras.src import backend as K
    from tf_keras.src.saving.legacy import hdf5_format
    from tf_keras.src.utils.io_utils import path_to_string

    def mod(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    mod("tensorflow.python.keras.engine.training",
        _is_hdf5_filepath=lambda p: str(p).endswith((".h5", ".hdf5", ".keras")))
    mod("tensorflow.python.keras.saving.hdf5_format",
        load_attributes_from_hdf5_group=hdf5_format.load_attributes_from_hdf5_group,
        _legacy_weights=hdf5_format._legacy_weights,
        preprocess_weights_for_loading=hdf5_format.preprocess_weights_for_loading)
    mod("tensorflow.python.keras.saving", hdf5_format=sys.modules[
        "tensorflow.python.keras.saving.hdf5_format"])
    mod("tensorflow.python.keras.distribute",
        distributed_training_utils=types.SimpleNamespace(
            is_tpu_strategy=lambda s: False))
    sys.modules["tensorflow.python.keras.distribute"].distributed_training_utils = \
        types.SimpleNamespace(is_tpu_strategy=lambda s: False)
    mod("tensorflow.python.keras.distribute.distributed_training_utils",
        is_tpu_strategy=lambda s: False)
    mod("tensorflow.python.keras.utils.io_utils", path_to_string=path_to_string)
    mod("tensorflow.python.keras.utils",
        io_utils=sys.modules["tensorflow.python.keras.utils.io_utils"])
    mod("tensorflow.python.keras", backend=K)
    sys.modules["tensorflow.python.keras"].backend = K


def parse_metrics(text):
    """Parse the compute_and_log_metrics output into per-section dicts."""
    sections = []
    current = None
    for line in text.splitlines():
        if "Evaluation on ALL FRAMES" in line or "Evaluation on KEYFRAMES" in line:
            current = {"frame": {}, "aw": {}}
            sections.append(current)
            mode = None
        elif current is not None:
            if line.startswith("Frame-wise evaluation"):
                mode = "frame"
            elif line.startswith("Total action-wise"):
                mode = "aw"
            elif line.startswith('Results for'):
                mode = None
            else:
                m = re.match(r"(MPJPE|NMPJPE|PAMPJPE): ([0-9.]+)", line)
                if m and mode is not None:
                    current[mode][m.group(1).lower()] = float(m.group(2))
    return sections


def main():
    cfg_path = os.path.join(FIXTURE_DIR, "eval_small_config.json")
    with open(cfg_path, "w") as f:
        json.dump(EVAL_CONFIG, f, indent=2)

    patch_keras()
    sys.path.insert(0, "/root/reference")
    from common.net.uplift_upsample_transformer_config import UpliftUpsampleConfig
    import eval as ref_eval

    results = {}
    for mask_stride in [5, 10]:
        config = UpliftUpsampleConfig(config_file=cfg_path)
        config.MASK_STRIDE = mask_stride
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            ref_eval.run_eval(
                config=config, dataset_name="h36m",
                dataset_path=os.path.join(SYNTH_DIR, "data_3d_h36m.npz"),
                dataset2d_path=os.path.join(SYNTH_DIR, "data_2d_h36m_synth.npz"),
                test_subset="test",
                weights_path=os.path.join(FIXTURE_DIR, "small_strided.h5"),
                action_wise=True)
        text = buf.getvalue()
        sections = parse_metrics(text)
        assert len(sections) == 2, f"expected 2 sections, got {len(sections)}\n{text[-2000:]}"
        results[str(mask_stride)] = {
            "all_frames": sections[0], "keyframes": sections[1],
        }
        print(f"mask_stride={mask_stride}:", json.dumps(sections[0]["frame"]))

    with open(os.path.join(FIXTURE_DIR, "eval_parity.json"), "w") as f:
        json.dump(results, f, indent=2)
    print("eval_parity.json saved")


if __name__ == "__main__":
    main()
