"""Logger backend tests.

The TensorBoard writer is a from-scratch encoder (TFRecord framing + masked
CRC32C + hand-encoded protobufs); it is golden-tested here against the REAL
tensorboard parser when available, and against RFC 3720 CRC vectors always.
"""

import json
import os

import numpy as np
import pytest

from dmme_tpu.training.loggers import (
    JsonlLogger,
    MultiLogger,
    TensorBoardLogger,
    crc32c,
    _masked_crc,
    _png_encode,
)
from dmme_tpu.training.metrics import MetricLogger


class TestCrc32c:
    def test_rfc3720_vectors(self):
        # iSCSI / RFC 3720 appendix B.4 test vectors
        assert crc32c(b"") == 0
        assert crc32c(b"123456789") == 0xE3069283
        assert crc32c(b"\x00" * 32) == 0x8A9136AA
        assert crc32c(b"\xff" * 32) == 0x62A8AB43
        assert crc32c(bytes(range(32))) == 0x46DD794E

    def test_masked_crc_known(self):
        # TFRecord mask formula applied to a known crc
        crc = crc32c(b"123456789")
        want = (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF
        assert _masked_crc(b"123456789") == want


class TestTensorBoardLogger:
    def _read_events(self, tb_dir):
        """Parse with the real tensorboard package (installed in this env)."""
        tbparse = pytest.importorskip(
            "tensorboard.backend.event_processing.event_file_loader"
        )
        files = sorted(os.listdir(tb_dir))
        assert len(files) == 1
        loader = tbparse.RawEventFileLoader(os.path.join(tb_dir, files[0]))
        from tensorboard.compat.proto import event_pb2

        return [event_pb2.Event.FromString(bytes(r)) for r in loader.Load()]

    def test_scalars_roundtrip_through_real_tensorboard(self, tmp_path):
        tb = TensorBoardLogger(str(tmp_path / "tb"))
        tb.log_metrics({"loss": 1.5, "lr": 2e-4, "skipme": "str"}, step=3)
        tb.log_metrics({"loss": 1.25}, step=4)
        tb.finalize()

        events = self._read_events(str(tmp_path / "tb"))
        assert events[0].file_version == "brain.Event:2"
        scalars = {}
        for ev in events[1:]:
            for v in ev.summary.value:
                scalars[(v.tag, ev.step)] = v.simple_value
        assert scalars[("loss", 3)] == pytest.approx(1.5)
        assert scalars[("lr", 3)] == pytest.approx(2e-4)
        assert scalars[("loss", 4)] == pytest.approx(1.25)
        assert ("skipme", 3) not in scalars  # non-numeric dropped

    def test_image_roundtrip(self, tmp_path):
        tb = TensorBoardLogger(str(tmp_path / "tb"))
        img = (np.arange(12 * 8 * 3).reshape(12, 8, 3) % 256).astype(np.uint8)
        tb.log_image("samples", img, step=7)
        tb.finalize()

        events = self._read_events(str(tmp_path / "tb"))
        (val,) = events[-1].summary.value
        assert val.tag == "samples"
        assert val.image.height == 12 and val.image.width == 8
        assert val.image.colorspace == 3
        # decode the embedded PNG and compare pixels
        from PIL import Image
        import io

        decoded = np.asarray(Image.open(io.BytesIO(val.image.encoded_image_string)))
        np.testing.assert_array_equal(decoded, img)

    def test_float_image_clipped_scaled(self, tmp_path):
        tb = TensorBoardLogger(str(tmp_path / "tb"))
        tb.log_image("f", np.linspace(-0.5, 1.5, 48).reshape(4, 4, 3), step=1)
        tb.finalize()
        events = self._read_events(str(tmp_path / "tb"))
        (val,) = events[-1].summary.value
        assert val.image.height == 4


class TestFallbackPng:
    def test_from_scratch_png_decodes(self):
        from PIL import Image
        import io

        img = (np.arange(5 * 7 * 3) % 251).astype(np.uint8).reshape(5, 7, 3)
        png = _png_encode(img)
        decoded = np.asarray(Image.open(io.BytesIO(png)))
        np.testing.assert_array_equal(decoded, img)


class TestJsonlLogger:
    def test_scalars_and_images(self, tmp_path):
        lg = JsonlLogger(str(tmp_path))
        lg.log_metrics({"loss": 0.5}, step=1)
        lg.log_metrics({"loss": 0.25, "note": "x"}, step=2)
        path = lg.log_image("grid", np.zeros((4, 4, 3), np.uint8), step=2)
        lg.finalize()

        lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
        assert lines[0]["loss"] == 0.5 and lines[0]["step"] == 1
        assert lines[1]["note"] == "x"
        assert os.path.exists(path)


class FakeLogger:
    def __init__(self):
        self.metrics, self.images, self.finalized = [], [], False

    def log_metrics(self, m, step):
        self.metrics.append((step, dict(m)))

    def log_image(self, tag, image, step):
        self.images.append((tag, np.asarray(image).shape, step))

    def finalize(self):
        self.finalized = True


class TestMetricLoggerComposition:
    def test_fanout_and_close(self):
        a, b = FakeLogger(), FakeLogger()
        ml = MetricLogger(loggers=[a, b])
        ml.log(5, {"loss": 1.0}, echo=False)
        ml.log_image("samples", np.zeros((2, 2, 3)), 5)
        ml.close()
        for lg in (a, b):
            assert lg.metrics == [(5, {"loss": 1.0})]
            assert lg.images == [("samples", (2, 2, 3), 5)]
            assert lg.finalized

    def test_multilogger(self):
        a = FakeLogger()
        m = MultiLogger([a])
        m.log_metrics({"x": 1}, 1)
        assert a.metrics


class TestGenerateImageLogsThroughLogger:
    def test_grid_logged(self, tmp_path):
        """GenerateImage must push the grid through logger.log_image
        (reference: callbacks/generate.py:55-62 logs to W&B/TB)."""
        from dmme_tpu.callbacks import GenerateImage

        class StubLit:
            def generate(self, state, rng, shape, use_ema=None, history_length=None):
                hist = np.zeros((history_length,) + shape, np.float32)
                return hist[-1], hist

        fake = FakeLogger()
        cb = GenerateImage(
            imgsize=(3, 8, 8), num_samples=2, vis_length=3,
            out_dir=str(tmp_path), every_n_steps=1,
        )
        cb.on_train_step_end(step=1, lit=StubLit(), state=None, logger=fake)
        assert len(fake.images) == 1
        tag, shape, step = fake.images[0]
        assert tag == "samples" and step == 1 and shape[-1] == 3
