"""DCD trajectory writer/reader roundtrip."""
import numpy as np

from constant_ph_tpu.trajectory import DCDWriter, read_dcd


def test_dcd_roundtrip(tmp_path):
    path = str(tmp_path / "t.dcd")
    rng = np.random.default_rng(0)
    frames = rng.uniform(0, 20, size=(5, 17, 3)).astype(np.float32)
    box = np.array([20.0, 21.0, 22.0])
    with DCDWriter(path, 17, dt_fs=2.0) as w:
        for f in frames:
            w.write_frame(f, box)
    got, boxes = read_dcd(path)
    assert got.shape == (5, 17, 3)
    np.testing.assert_allclose(got, frames, atol=1e-6)
    np.testing.assert_allclose(boxes[0], box, atol=1e-9)
