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

    def test_bitshuffle_stored_stream(self, tmp_path):
        """Bit-shuffled block (c-blosc layout: full LSB-first bit transpose
        when elems per block is a multiple of 8), stream stored raw."""
        data = np.arange(16, dtype="<i4")  # 64 bytes, 16 elems
        bits = np.unpackbits(data.view(np.uint8).reshape(16, 4), axis=1,
                             bitorder="little")          # (elems, ts*8)
        shuf = np.packbits(bits.T.copy(), axis=1, bitorder="little").reshape(-1)
        body = b"".join(struct.pack("<i", 16) + shuf[t * 16:(t + 1) * 16].tobytes()
                        for t in range(4))               # 4-way split, raw
        bstarts = struct.pack("<i", 16 + 4)
        chunk = _blosc_header(0x4 | (1 << 5), 4, 64, 64,
                              16 + 4 + len(body)) + bstarts + body
        path = _blosc_array_dir(tmp_path, chunk, data.shape, "<i4")
        np.testing.assert_array_equal(zarr_lite.Array(path)[:], data)


_REAL_BLOSC = "/usr/lib/x86_64-linux-gnu/libblosc.so.1"


def _real_blosc_lib():
    import ctypes

    lib = ctypes.CDLL(_REAL_BLOSC)
    lib.blosc_compress_ctx.restype = ctypes.c_int
    lib.blosc_compress_ctx.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_size_t, ctypes.c_size_t,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int]
    return lib


def _real_blosc_compress(raw: bytes, typesize: int, clevel: int,
                         shuffle: int, blocksize: int = 0) -> bytes:
    import ctypes

    lib = _real_blosc_lib()
    dest = ctypes.create_string_buffer(len(raw) + 1024)
    n = lib.blosc_compress_ctx(clevel, shuffle, typesize, len(raw), raw,
                               dest, len(dest), b"lz4", blocksize, 1)
    assert n > 0, f"blosc_compress_ctx failed: {n}"
    return dest.raw[:n]


@needs_native
@pytest.mark.skipif(not os.path.exists(_REAL_BLOSC),
                    reason="system libblosc not present")
class TestRealCBlosc:
    """Chunks produced by the REAL c-blosc library (1.21.x on this host) —
    non-self-constructed input for the native decoder, pinning the split
    policy and the bit-shuffle layout against genuine output of the library
    zarr 2.4 links (the reference's stores: vhoi/data_loading.py:27-31)."""

    CASES = [
        # (dtype, n_elems, clevel, shuffle, blocksize)
        ("<f4", 5000, 5, 1, 0),      # zarr 2.4 default: lz4-5, byte shuffle
        ("<f4", 5000, 5, 2, 0),      # bit shuffle
        ("<f8", 3000, 9, 1, 0),      # lz4hc level
        ("<f8", 2500, 5, 2, 0),      # f8 bitshuffle
        ("<i2", 7777, 5, 2, 0),      # odd count, elems%8 != 0 tail
        ("<i2", 7777, 5, 1, 0),
        ("|u1", 300, 1, 2, 0),       # tiny, single unsplit stream
        ("<i8", 500, 5, 2, 0),       # elems%8 != 0 -> verbatim block
        ("<f4", 40000, 5, 1, 4096),  # forced small blocks, multi-block
        ("<f4", 40001, 5, 2, 4096),  # multi-block + partial tail block
        ("<i4", 1024, 5, 0, 0),      # no shuffle
    ]

    @pytest.mark.parametrize("dtype,n,clevel,shuffle,bs", CASES)
    def test_decode_real_chunk(self, dtype, n, clevel, shuffle, bs):
        rng = np.random.default_rng(hash((dtype, n, clevel, shuffle)) % 2**32)
        itemsize = np.dtype(dtype).itemsize
        # Low-entropy data: compressible (exercises real LZ4 streams) but
        # non-trivial in every byte plane.
        data = (rng.integers(0, 5, size=n * itemsize)
                .astype(np.uint8).view(dtype))
        raw = data.tobytes()
        chunk = _real_blosc_compress(raw, itemsize, clevel, shuffle, bs)
        out = zarr_lite._decompress_blosc(chunk, len(raw))
        assert out == raw

    def test_incompressible_memcpy_chunk(self):
        rng = np.random.default_rng(99)
        raw = rng.integers(0, 256, size=4096).astype(np.uint8).tobytes()
        chunk = _real_blosc_compress(raw, 4, 5, 1)
        assert zarr_lite._decompress_blosc(chunk, len(raw)) == raw

    def test_zarr_store_with_real_blosc_chunks(self, tmp_path):
        """Full Array read path over chunks the real library wrote."""
        data = np.linspace(0, 1, 6 * 500 * 4, dtype="<f4").reshape(6, 500, 4)
        array_dir = tmp_path / "real.zarr"
        array_dir.mkdir()
        meta = {"zarr_format": 2, "shape": list(data.shape),
                "chunks": [2, 500, 4], "dtype": "<f4",
                "compressor": {"id": "blosc", "cname": "lz4", "clevel": 5,
                               "shuffle": 2, "blocksize": 0},
                "fill_value": 0.0, "order": "C", "filters": None}
        (array_dir / ".zarray").write_text(json.dumps(meta))
        for j in range(3):
            raw = np.ascontiguousarray(data[2 * j:2 * j + 2]).tobytes()
            (array_dir / f"{j}.0.0").write_bytes(
                _real_blosc_compress(raw, 4, 5, 2))
        np.testing.assert_array_equal(zarr_lite.Array(str(array_dir))[:], data)

    def test_fuzz_random_params(self):
        """Randomised sweep: any chunk the real library emits must decode."""
        rng = np.random.default_rng(7)
        for trial in range(40):
            itemsize = int(rng.choice([1, 2, 3, 4, 6, 8, 16]))
            n = int(rng.integers(1, 5000))
            clevel = int(rng.integers(1, 10))
            shuffle = int(rng.integers(0, 3))
            bs = int(rng.choice([0, 1024, 4096]))
            lo = int(rng.integers(2, 30))
            raw = (rng.integers(0, lo, size=n * itemsize)
                   .astype(np.uint8).tobytes())
            chunk = _real_blosc_compress(raw, itemsize, clevel, shuffle, bs)
            out = zarr_lite._decompress_blosc(chunk, len(raw))
            assert out == raw, (trial, itemsize, n, clevel, shuffle, bs)


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
