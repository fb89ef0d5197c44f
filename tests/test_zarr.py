"""zarr-v2 DirectoryStore support (tggcn/data/zarr_lite.py).

Covers the vendored reader/writer round-trip, the native blosc-LZ4 chunk
decoder against hand-constructed format-conformant chunks, and the full
load_training_data path over a real zarr store (same group layout as the
reference's distributed datasets, vhoi/data_loading.py:27-31).
"""

import json
import os
import struct
import zlib

import numpy as np
import pytest

from tggcn.data import zarr_lite


class TestRoundTrip:
    def test_write_read_basic(self, tmp_path):
        root = zarr_lite.create_group(str(tmp_path / "store.zarr"))
        data = np.arange(24, dtype=np.float32).reshape(4, 6)
        zarr_lite.write_array(root, "vid0/skeleton", data)
        store = zarr_lite.open_readonly(root)
        np.testing.assert_array_equal(store["vid0/skeleton"][:], data)
        np.testing.assert_array_equal(store["vid0"]["skeleton"][2:], data[2:])
        assert "vid0" in store and "skeleton" in store["vid0"]
        assert list(store.keys()) == ["vid0"]

    def test_partial_chunks(self, tmp_path):
        root = zarr_lite.create_group(str(tmp_path / "s.zarr"))
        data = np.random.default_rng(0).normal(size=(7, 5)).astype(np.float64)
        zarr_lite.write_array(root, "x", data, chunks=(3, 2))
        np.testing.assert_array_equal(zarr_lite.open_readonly(root)["x"][:], data)

    def test_missing_chunk_fill_value(self, tmp_path):
        root = zarr_lite.create_group(str(tmp_path / "s.zarr"))
        data = np.ones((6, 4), dtype=np.int32)
        path = zarr_lite.write_array(root, "x", data, chunks=(3, 4))
        os.remove(os.path.join(path, "1.0"))
        loaded = zarr_lite.open_readonly(root)["x"][:]
        np.testing.assert_array_equal(loaded[:3], 1)
        np.testing.assert_array_equal(loaded[3:], 0)

    def test_int_dtype_and_3d(self, tmp_path):
        root = zarr_lite.create_group(str(tmp_path / "s.zarr"))
        data = np.random.default_rng(1).integers(0, 100, size=(5, 3, 4)).astype(np.int64)
        zarr_lite.write_array(root, "grp/x", data, chunks=(2, 3, 4))
        store = zarr_lite.open_readonly(root)
        np.testing.assert_array_equal(store["grp"]["x"][:], data)

    def test_zlib_compressed_chunks(self, tmp_path):
        """Chunks written with the numcodecs zlib codec decode in pure Python."""
        array_dir = tmp_path / "z.zarr"
        array_dir.mkdir()
        data = np.arange(12, dtype="<f4")
        meta = {"zarr_format": 2, "shape": [12], "chunks": [12],
                "dtype": "<f4", "compressor": {"id": "zlib", "level": 5},
                "fill_value": 0.0, "order": "C", "filters": None}
        (array_dir / ".zarray").write_text(json.dumps(meta))
        (array_dir / "0").write_bytes(zlib.compress(data.tobytes()))
        np.testing.assert_array_equal(zarr_lite.Array(str(array_dir))[:], data)


def _blosc_header(flags, typesize, nbytes, blocksize, cbytes):
    return bytes([2, 1, flags, typesize]) + struct.pack(
        "<iii", nbytes, blocksize, cbytes)


def _blosc_array_dir(tmp_path, chunk: bytes, shape, dtype):
    array_dir = tmp_path / "b.zarr"
    array_dir.mkdir()
    meta = {"zarr_format": 2, "shape": list(shape), "chunks": list(shape),
            "dtype": dtype,
            "compressor": {"id": "blosc", "cname": "lz4", "clevel": 5,
                           "shuffle": 1},
            "fill_value": 0, "order": "C", "filters": None}
    (array_dir / ".zarray").write_text(json.dumps(meta))
    (array_dir / "0").write_bytes(chunk)
    return str(array_dir)


needs_native = pytest.mark.skipif(zarr_lite._load_native() is None,
                                  reason="native/libbloscdec.so not built")


@needs_native
class TestBloscDecode:
    def test_memcpy_chunk(self, tmp_path):
        data = np.arange(10, dtype="<i4")
        raw = data.tobytes()
        chunk = _blosc_header(0x2 | (1 << 5), 4, len(raw), len(raw),
                              16 + len(raw)) + raw
        path = _blosc_array_dir(tmp_path, chunk, data.shape, "<i4")
        np.testing.assert_array_equal(zarr_lite.Array(path)[:], data)

    def test_shuffled_split_stored_streams(self, tmp_path):
        """typesize-way split block with byte shuffle, streams stored raw."""
        data = np.arange(8, dtype="<i4")  # 32 bytes, typesize 4
        planes = data.view(np.uint8).reshape(8, 4).T.copy()  # byte shuffle
        body = b"".join(struct.pack("<i", 8) + planes[t].tobytes()
                        for t in range(4))
        bstarts = struct.pack("<i", 16 + 4)  # one block, offset past header
        chunk = _blosc_header(0x1 | (1 << 5), 4, 32, 32,
                              16 + 4 + len(body)) + bstarts + body
        path = _blosc_array_dir(tmp_path, chunk, data.shape, "<i4")
        np.testing.assert_array_equal(zarr_lite.Array(path)[:], data)

    def test_lz4_compressed_stream(self, tmp_path):
        """Hand-built LZ4 sequence: 4 literals + overlapping match of 60."""
        expected = (b"abcd" * 16)
        lz4 = bytes([0x4F]) + b"abcd" + struct.pack("<H", 4) + bytes([41])
        body = struct.pack("<i", len(lz4)) + lz4
        bstarts = struct.pack("<i", 16 + 4)
        chunk = _blosc_header(1 << 5, 1, 64, 64,
                              16 + 4 + len(body)) + bstarts + body
        path = _blosc_array_dir(tmp_path, chunk, (64,), "|u1")
        np.testing.assert_array_equal(
            zarr_lite.Array(path)[:], np.frombuffer(expected, dtype=np.uint8))

    def test_zero_stream(self, tmp_path):
        body = struct.pack("<i", 0)  # cbytes == 0 -> all-zero stream
        bstarts = struct.pack("<i", 16 + 4)
        chunk = _blosc_header(1 << 5, 1, 16, 16, 16 + 4 + len(body)) + bstarts + body
        path = _blosc_array_dir(tmp_path, chunk, (16,), "|u1")
        np.testing.assert_array_equal(zarr_lite.Array(path)[:], np.zeros(16))

    def test_bitshuffle_rejected(self, tmp_path):
        chunk = _blosc_header(0x4 | (1 << 5), 4, 16, 16, 16) + b"\x00" * 16
        path = _blosc_array_dir(tmp_path, chunk, (4,), "<i4")
        with pytest.raises(ValueError, match="bit-shuffled"):
            zarr_lite.Array(path)[:]


class TestLoadersOverZarr:
    """The real on-disk zarr format flows through load_training_data."""

    @pytest.mark.parametrize("dataset", ["mphoi", "cad120", "bimanual"])
    def test_zarr_store_matches_npz(self, tmp_path, dataset):
        from tggcn.config import Config
        from tggcn.data.loading import load_training_data
        from tggcn.data.synthetic import (
            generate_bimanual_dataset,
            generate_cad120_dataset,
            generate_mphoi_dataset,
        )

        generate = {"mphoi": generate_mphoi_dataset,
                    "cad120": generate_cad120_dataset,
                    "bimanual": generate_bimanual_dataset}[dataset]
        subject = {"mphoi": "Subject45", "cad120": "Subject1",
                   "bimanual": "1"}[dataset]
        kwargs = dict(num_videos=6, min_len=18, max_len=30, seed=7)
        paths_npz = generate(str(tmp_path / "npz"), **kwargs)
        paths_zarr = generate(str(tmp_path / "zarr"), store_format="zarr",
                              **kwargs)
        assert any(str(v).endswith(".zarr") for v in paths_zarr.values())

        loaders = []
        for paths in (paths_npz, paths_zarr):
            cfg = Config({"name": dataset,
                          **{k: v for k, v in paths.items() if k != "name"},
                          "cross_validation_test_subject": subject,
                          "scaling_strategy": None, "downsampling": 3})
            train_loader, _val, _info, _scalers = load_training_data(
                cfg, "2G-GCN", "multiple", batch_size=2, val_fraction=0.25)
            loaders.append(train_loader)
        for a, b in zip(loaders[0].tensors, loaders[1].tensors):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
