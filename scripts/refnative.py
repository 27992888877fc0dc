"""ctypes harness around the REFERENCE's own native kernels, built
out-of-tree, used only to measure honest baselines and parity oracles.

The reference ships two native libraries (SURVEY.md §2.2):
  - libsift4ctypes.so: the SIMD C++ SIFT detector + brute-force 2-NN
    matcher (/root/reference/3rdparty/sift/simd/sift4ctypes.cpp:71,125)
  - disp_to_h.so: per-match iterative-height stereo triangulation
    (/root/reference/c/disp_to_h.c:40 via rpc.c:480 rpc_height)

`ensure_built()` copies the reference tree to a scratch dir (never
touching /root/reference) and runs its own Makefile (`make default`,
plain g++/cc, no external deps beyond libtiff/png/jpeg/z). The wrappers
below mirror the reference's ctypes bindings
(bundle_adjust/s2p/sift.py:33-83, s2p/triangulation.py:18-125) but take
this framework's RPCModel so both implementations can be fed identical
inputs.

Nothing in the package imports this module; it backs
scripts/bench_reference_native.py and tests/test_native_ref_parity.py.
"""

import ctypes
import os
import shutil
import subprocess

import numpy as np

REF_DIR = os.environ.get("SATBA_REF_DIR", "/root/reference")
BUILD_DIR = os.environ.get("SATBA_REF_BUILD", "/tmp/refbuild")


def ensure_built():
    """Build the reference native libs out-of-tree; return their paths.

    Returns (sift_so, disph_so) or raises RuntimeError when the reference
    tree is absent or the build fails (callers/tests should skip then).
    """
    sift_so = os.path.join(BUILD_DIR, "lib", "libsift4ctypes.so")
    disph_so = os.path.join(BUILD_DIR, "lib", "disp_to_h.so")
    if os.path.exists(sift_so) and os.path.exists(disph_so):
        return sift_so, disph_so
    if not os.path.isdir(REF_DIR):
        raise RuntimeError(f"reference tree not found at {REF_DIR}")
    if not os.path.isdir(BUILD_DIR):
        shutil.copytree(REF_DIR, BUILD_DIR)
    proc = subprocess.run(
        ["make", "default"], cwd=BUILD_DIR, capture_output=True, text=True,
        timeout=900,
    )
    if proc.returncode != 0 or not os.path.exists(sift_so):
        raise RuntimeError(f"reference build failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")
    return sift_so, disph_so


def ref_sift(arr, thresh_dog=0.0133, nb_octaves=8, nb_scales=3, lib=None):
    """Run the reference SIMD SIFT on a float image.

    Mirrors s2p/sift.py:33-83 (keypoints_from_nparray). Returns an
    (N, 132) array of (y, x, scale, orientation, 128-descriptor) rows.
    """
    if lib is None:
        lib = ctypes.CDLL(ensure_built()[0])
    arr = np.ascontiguousarray(arr, dtype=np.float32)
    h, w = arr.shape
    lib.sift.restype = ctypes.POINTER(ctypes.c_float)
    lib.sift.argtypes = (
        np.ctypeslib.ndpointer(dtype=ctypes.c_float, shape=(h, w)),
        ctypes.c_uint, ctypes.c_uint, ctypes.c_float,
        ctypes.c_uint, ctypes.c_uint,
        ctypes.POINTER(ctypes.c_uint), ctypes.POINTER(ctypes.c_uint),
    )
    nb_points = ctypes.c_uint()
    desc_size = ctypes.c_uint()
    ptr = lib.sift(arr, w, h, thresh_dog, nb_octaves, nb_scales,
                   ctypes.byref(desc_size), ctypes.byref(nb_points))
    n, d = nb_points.value, desc_size.value
    kps = np.ctypeslib.as_array(ptr, shape=(n, d)).copy() if n else np.zeros((0, 132))
    lib.delete_buffer.argtypes = (ctypes.POINTER(ctypes.c_float),)
    lib.delete_buffer(ptr)
    return kps


def ref_match(k1, k2, sift_thresh=0.6, relative=True, fund_mat=None,
              epi_thresh=10.0, lib=None):
    """Run the reference brute-force 2-NN matcher.

    Mirrors s2p/sift.py:189-237 (keypoints_match_from_nparray) calling
    matching() (sift4ctypes.cpp:125-195). k1/k2 are (N, 132) keypoint
    rows; returns (M, 4) matched (y1, x1, y2, x2) coordinates.
    """
    if lib is None:
        lib = ctypes.CDLL(ensure_built()[0])
    k1 = np.ascontiguousarray(k1, dtype=np.float32)
    k2 = np.ascontiguousarray(k2, dtype=np.float32)
    n1, n2 = k1.shape[0], k2.shape[0]
    length_desc, offset_desc = 128, 4
    use_f = fund_mat is not None
    fm = np.zeros(5, dtype=np.float64)
    if use_f:
        fm = np.ascontiguousarray(fund_mat, dtype=np.float64)
    lib.matching.restype = ctypes.POINTER(ctypes.c_float)
    lib.matching.argtypes = (
        np.ctypeslib.ndpointer(dtype=ctypes.c_float, shape=k1.shape),
        np.ctypeslib.ndpointer(dtype=ctypes.c_float, shape=k2.shape),
        ctypes.c_uint, ctypes.c_uint, ctypes.c_uint, ctypes.c_uint,
        ctypes.c_float, ctypes.c_float,
        np.ctypeslib.ndpointer(dtype=ctypes.c_double, shape=fm.shape),
        ctypes.c_bool, ctypes.c_bool,
        ctypes.POINTER(ctypes.c_uint),
    )
    nb_match = ctypes.c_uint()
    ptr = lib.matching(k1, k2, length_desc, offset_desc, n1, n2,
                       sift_thresh, epi_thresh, fm, use_f, relative,
                       ctypes.byref(nb_match))
    m = nb_match.value
    out = np.ctypeslib.as_array(ptr, shape=(m, 4)).copy() if m else np.zeros((0, 4))
    lib.delete_buffer.argtypes = (ctypes.POINTER(ctypes.c_float),)
    lib.delete_buffer(ptr)
    return out


class _RPCStruct(ctypes.Structure):
    """Mirror of the C rpc struct (/root/reference/c/rpc.h:14-32), filled
    from this framework's RPCModel (field mapping per
    s2p/triangulation.py:38-78: inum/iden = projection coefficients,
    direct-model coefficients NaN, delta = 0.1)."""

    _fields_ = [
        ("numx", ctypes.c_double * 20), ("denx", ctypes.c_double * 20),
        ("numy", ctypes.c_double * 20), ("deny", ctypes.c_double * 20),
        ("scale", ctypes.c_double * 3), ("offset", ctypes.c_double * 3),
        ("inumx", ctypes.c_double * 20), ("idenx", ctypes.c_double * 20),
        ("inumy", ctypes.c_double * 20), ("ideny", ctypes.c_double * 20),
        ("iscale", ctypes.c_double * 3), ("ioffset", ctypes.c_double * 3),
        ("dmval", ctypes.c_double * 4), ("imval", ctypes.c_double * 4),
        ("delta", ctypes.c_double),
    ]

    @classmethod
    def from_rpcmodel(cls, r, delta=0.1):
        s = cls()
        s.offset[0], s.offset[1], s.offset[2] = (
            float(r.col_offset), float(r.row_offset), float(r.alt_offset))
        s.scale[0], s.scale[1], s.scale[2] = (
            float(r.col_scale), float(r.row_scale), float(r.alt_scale))
        s.ioffset[0], s.ioffset[1], s.ioffset[2] = (
            float(r.lon_offset), float(r.lat_offset), float(r.alt_offset))
        s.iscale[0], s.iscale[1], s.iscale[2] = (
            float(r.lon_scale), float(r.lat_scale), float(r.alt_scale))
        samp_num = np.asarray(r.samp_num, dtype=np.float64)
        samp_den = np.asarray(r.samp_den, dtype=np.float64)
        line_num = np.asarray(r.line_num, dtype=np.float64)
        line_den = np.asarray(r.line_den, dtype=np.float64)
        for i in range(20):
            s.inumx[i] = samp_num[i]
            s.idenx[i] = samp_den[i]
            s.inumy[i] = line_num[i]
            s.ideny[i] = line_den[i]
            s.numx[i] = s.denx[i] = s.numy[i] = s.deny[i] = float("nan")
        s.delta = delta
        return s


def ref_triangulate(rpc1, rpc2, pts1, pts2, lib=None):
    """Triangulate matched pixel pairs with the reference C kernel.

    Mirrors s2p/triangulation.py:80-125 (stereo_corresp_to_xyz without
    the CRS conversion). Returns ((N, 3) lon/lat/alt, (N,) error px).
    """
    if lib is None:
        lib = ctypes.CDLL(ensure_built()[1])
    pts1 = np.ascontiguousarray(pts1, dtype=np.float32)
    pts2 = np.ascontiguousarray(pts2, dtype=np.float32)
    n = pts1.shape[0]
    s1 = _RPCStruct.from_rpcmodel(rpc1)
    s2 = _RPCStruct.from_rpcmodel(rpc2)
    lib.stereo_corresp_to_lonlatalt.argtypes = (
        np.ctypeslib.ndpointer(dtype=ctypes.c_double, shape=(n, 3)),
        np.ctypeslib.ndpointer(dtype=ctypes.c_float, shape=(n, 1)),
        np.ctypeslib.ndpointer(dtype=ctypes.c_float, shape=(n, 2)),
        np.ctypeslib.ndpointer(dtype=ctypes.c_float, shape=(n, 2)),
        ctypes.c_int, ctypes.POINTER(_RPCStruct), ctypes.POINTER(_RPCStruct),
    )
    lonlatalt = np.zeros((n, 3), dtype=np.float64)
    err = np.zeros((n, 1), dtype=np.float32)
    lib.stereo_corresp_to_lonlatalt(lonlatalt, err, pts1, pts2, n,
                                    ctypes.byref(s1), ctypes.byref(s2))
    return lonlatalt, err[:, 0]
