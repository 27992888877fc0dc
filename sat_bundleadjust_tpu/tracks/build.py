"""Feature track construction and connectivity checks.

Covers the reference's feature_tracks/ft_utils.py:20-260 and :491-557:
union-find over pairwise matches into the correspondence matrix C (2M x N)
and keypoint-id matrix C_v2 (M x N), plus camera-connectivity sanity checks.

The union-find here is an iterative path-halving implementation (the
reference's recursive `find` at ft_utils.py:119-121 blows the Python stack
on long chains); the C-matrix fill is fully vectorized."""

import ctypes
import os

import numpy as np

_NATIVE_LIB = None
_NATIVE_TRIED = False


def _load_native():
    """ctypes handle to native/libtrackbuild.so (built by native/Makefile),
    the C++ union-find kernel. Returns None if unavailable."""
    global _NATIVE_LIB, _NATIVE_TRIED
    if _NATIVE_TRIED:
        return _NATIVE_LIB
    _NATIVE_TRIED = True
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    for candidate in (
        os.path.join(repo_root, "native", "libtrackbuild.so"),
        os.path.join(os.path.dirname(__file__), "libtrackbuild.so"),
    ):
        if os.path.exists(candidate):
            try:
                lib = ctypes.CDLL(candidate)
                lib.uf_build.restype = None
                lib.uf_build.argtypes = [
                    ctypes.c_int64,
                    np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS"),
                    np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS"),
                    ctypes.c_int64,
                    np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS"),
                ]
                _NATIVE_LIB = lib
                break
            except OSError:
                continue
    return _NATIVE_LIB


def union_find(n, edges_a, edges_b):
    """Union-find over match edges; returns the root of each element.

    Uses the native C++ kernel (native/trackbuild.cpp, path compression +
    union by rank) when built, else a Python path-halving fallback. The
    reference's recursive implementation is at ft_utils.py:119-135."""
    edges_a = np.ascontiguousarray(edges_a, dtype=np.int64)
    edges_b = np.ascontiguousarray(edges_b, dtype=np.int64)
    lib = _load_native()
    if lib is not None:
        roots = np.empty(n, dtype=np.int64)
        lib.uf_build(n, edges_a, edges_b, len(edges_a), roots)
        return roots

    parent = np.arange(n, dtype=np.int64)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(edges_a.tolist(), edges_b.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    for i in range(n):
        parent[i] = find(i)
    return parent


def filter_C_using_pairs_to_triangulate(C, pairs_to_triangulate):
    """Tracks containing >= 1 triangulation-suitable pair (vectorized).

    Reference: ft_utils.py:38-62."""
    from sat_bundleadjust_tpu.ba.outliers import filter_C_using_pairs_to_triangulate as f

    return f(C, pairs_to_triangulate)


def feature_tracks_from_pairwise_matches(features, pairwise_matches, pairs_to_triangulate):
    """Build C and C_v2 from pairwise matches.

    Args:
      features: list of per-image keypoint arrays (N_i, 132) or paths to .npy
      pairwise_matches: (K, 4) int array of rows (kp_i, kp_j, im_i, im_j)
      pairs_to_triangulate: list of camera index pairs

    Returns (C (2M, N), C_v2 (M, N)). Reference: ft_utils.py:65-182
    (C format documented at :70-88)."""
    loaded = [np.load(f, mmap_mode="r") if isinstance(f, str) else np.asarray(f) for f in features]
    n_cams = len(loaded)
    kp_counts = [f.shape[0] for f in loaded]
    id_offsets = np.concatenate([[0], np.cumsum(kp_counts)])[:-1]

    pm = np.asarray(pairwise_matches, dtype=np.int64)
    kp_i, kp_j, im_i, im_j = pm[:, 0], pm[:, 1], pm[:, 2], pm[:, 3]
    ids_i = id_offsets[im_i] + kp_i
    ids_j = id_offsets[im_j] + kp_j

    parents = union_find(int(np.sum(kp_counts)), ids_i, ids_j)

    # tracks = roots appearing >= 2 times
    uniq, inverse, counts = np.unique(parents, return_inverse=True, return_counts=True)
    is_track_root = counts > 1
    track_idx_of_root = np.full(len(uniq), -1, dtype=np.int64)
    track_idx_of_root[is_track_root] = np.arange(int(np.sum(is_track_root)))
    track_of_kp = track_idx_of_root[inverse]  # (-1 for unmatched)
    n_tracks = int(np.sum(is_track_root))

    C = np.full((2 * n_cams, n_tracks), np.nan)
    C_v2 = np.full((n_cams, n_tracks), np.nan)

    t_idx = track_of_kp[ids_i]
    all_xy = np.concatenate([np.asarray(f[:, :2]) for f in loaded], axis=0)
    coords_i = all_xy[ids_i]
    coords_j = all_xy[ids_j]
    C[2 * im_i, t_idx] = coords_i[:, 0]
    C[2 * im_i + 1, t_idx] = coords_i[:, 1]
    C[2 * im_j, t_idx] = coords_j[:, 0]
    C[2 * im_j + 1, t_idx] = coords_j[:, 1]
    C_v2[im_i, t_idx] = kp_i
    C_v2[im_j, t_idx] = kp_j

    keep = filter_C_using_pairs_to_triangulate(C, pairs_to_triangulate)
    return C[:, keep], C_v2[:, keep]


def check_pairs(camera_indices, pairs_to_match, pairs_to_triangulate):
    """Verify all cameras appear in both pair lists
    (reference: ft_utils.py:185-222)."""
    fatal_error, err_msg, disconnected = False, "", []
    camera_indices = set(int(i) for i in camera_indices)
    for name, pairs in (("pairs_to_match", pairs_to_match), ("pairs_to_triangulate", pairs_to_triangulate)):
        present = set(np.unique(np.array(pairs).flatten())) if pairs else set()
        missing = list(camera_indices - present)
        if missing:
            disconnected = missing
            fatal_error = len(missing) > len(camera_indices) // 2
            print("WARNING: Found {} cameras out of {} missing in {}".format(len(missing), len(camera_indices), name))
            print("         The disconnected camera indices are: {}".format(missing))
            if fatal_error:
                err_msg = "More than 50% of the cameras are disconnected in terms of feature tracking"
    return fatal_error, err_msg, disconnected


def check_correspondence_matrix(C, min_obs_cam=10):
    """Verify enough observations per camera (reference: ft_utils.py:225-260)."""
    fatal_error, err_msg, disconnected = False, "", []
    if C is None or C.shape[0] // 2 > C.shape[1]:
        return True, "Found less tracks than cameras", disconnected
    n_cam = C.shape[0] // 2
    obs_per_cam = np.sum(~np.isnan(C[::2]), axis=1)
    if np.sum(obs_per_cam < min_obs_cam) > 0:
        disconnected = np.arange(n_cam)[obs_per_cam < min_obs_cam].tolist()
        fatal_error = len(disconnected) > n_cam // 2
        print(
            "WARNING: Found {} cameras out of {} with less than {} tie point observations".format(
                len(disconnected), n_cam, min_obs_cam
            )
        )
        print("         The disconnected camera indices are: {}".format(disconnected))
        if fatal_error:
            err_msg = "More than 50% of the cameras are disconnected in terms of feature tracking"
    return fatal_error, err_msg, disconnected


def build_connectivity_matrix(C, min_matches=10):
    """(M, M) pairwise match counts (reference: ft_ranking.py:19-34),
    vectorized as one boolean matmul."""
    mask = (~np.isnan(C[::2])).astype(np.int64)
    A = mask @ mask.T
    np.fill_diagonal(A, 0)
    A[A < min_matches] = 0
    return A.astype(np.float64)


def build_connectivity_graph(C, min_matches, verbose=True):
    """Camera connectivity graph + connected components
    (reference: ft_utils.py:491-557)."""
    import networkx as nx

    n_cam = C.shape[0] // 2
    A = build_connectivity_matrix(C, 0)
    edges, matches_per_edge = [], []
    for i in range(n_cam):
        for j in range(i + 1, n_cam):
            if A[i, j] > min_matches:
                edges.append((i, j))
                matches_per_edge.append(int(A[i, j]))

    G = nx.Graph()
    G.add_nodes_from(range(n_cam))
    for e, m in zip(edges, matches_per_edge):
        G.add_edge(e[0], e[1], weight=m)
    G_cc = [G.subgraph(c) for c in nx.connected_components(G)]
    n_cc = len(G_cc)
    cams_per_cc = [len(g.nodes) for g in G_cc]
    largest = int(np.argmax(cams_per_cc)) if cams_per_cc else 0
    missing_cams = list(set(range(n_cam)) - set(G_cc[largest].nodes)) if G_cc else []
    if verbose:
        obs_per_cam = np.sum(~np.isnan(C), axis=1)[::2]
        print("Connectivity graph: {} connected components (CCs)".format(n_cc))
        print("                    {} missing cameras from largest CC: {}".format(len(missing_cams), missing_cams))
        print("                    {} edges".format(len(edges)))
        if matches_per_edge:
            print("                    {} min n_matches in an edge".format(min(matches_per_edge)))
        print("                    {} min obs per camera\n".format(int(np.min(obs_per_cam))))
    return G, edges, matches_per_edge, n_cc, missing_cams
