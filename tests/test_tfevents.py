"""Native tfevents writer (train/tfevents.py): TensorBoard's own loader
must parse our hand-rolled records back to the same scalars."""

import glob
import struct

import pytest

from vae_song_tpu.train.tfevents import (
    EventFileWriter,
    _crc32c,
    _masked_crc,
    _record,
)


def test_crc32c_known_vectors():
    # standard CRC32C test vectors (RFC 3720 appendix / kernel tests)
    assert _crc32c(b"") == 0x0
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA


def test_record_framing_roundtrip():
    data = b"hello tfrecord"
    rec = _record(data)
    (length,) = struct.unpack("<Q", rec[:8])
    assert length == len(data)
    (len_crc,) = struct.unpack("<I", rec[8:12])
    assert len_crc == _masked_crc(rec[:8])
    assert rec[12:-4] == data
    (data_crc,) = struct.unpack("<I", rec[-4:])
    assert data_crc == _masked_crc(data)


def test_writer_produces_parsable_events(tmp_path):
    w = EventFileWriter(str(tmp_path))
    scalars = [("loss/train", 1.5, 0), ("loss/train", 0.75, 1), ("kl", 3.25, 7)]
    for tag, val, step in scalars:
        w.add_scalar(tag, val, step)
    w.close()

    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    assert len(files) == 1

    loader = pytest.importorskip(
        "tensorboard.backend.event_processing.event_file_loader"
    )
    events = list(loader.EventFileLoader(files[0]).Load())
    assert events[0].file_version == "brain.Event:2"
    got = []
    for ev in events[1:]:
        for v in ev.summary.value:
            # the loader's data_compat pass migrates simple_value into a
            # scalar tensor; accept either representation
            val = v.tensor.float_val[0] if v.tensor.float_val else v.simple_value
            got.append((v.tag, val, ev.step))
    assert got == [(t, pytest.approx(v), s) for t, v, s in scalars]


def test_loggers_wrapper_uses_native_writer(tmp_path):
    from vae_song_tpu.train.loggers import TensorBoardWriter

    w = TensorBoardWriter(str(tmp_path / "run"))
    w.add_scalar("x", 2.0, 3)
    w.close()
    assert glob.glob(str(tmp_path / "run" / "events.out.tfevents.*"))
