"""Host-side IO: images, RPC files, point clouds, json, masks.

Covers the reference's bundle_adjust/loader.py, internalizing rasterio
(replaced by a minimal TIFF tag parser + cv2/PIL pixel readers) and rpcm
(replaced by sat_bundleadjust_tpu.models.rpc)."""

import json
import os

import numpy as np

from sat_bundleadjust_tpu.models.rpc import (
    RPCModel,
    rpc_from_json_file,
    rpc_from_rpc_file,
    write_rpc_file,
)
from sat_bundleadjust_tpu.utils import tiffmeta


def flush_print(s):
    print(s, flush=True)


def display_dict(d):
    """Reference: loader.py:27-34."""
    if not d:
        return
    max_k = max(len(k) for k in d)
    for k in d:
        print("    - {}:{}{}".format(k, " " * (max_k - len(k) + 2), d[k]))
    print("\n")


def get_id(fname):
    """Basename without extension (reference: loader.py:67-71)."""
    return os.path.splitext(os.path.basename(fname))[0]


def get_time_in_hours_mins_secs(seconds):
    """Reference: loader.py:47-54."""
    hours, rem = divmod(seconds, 3600)
    minutes, secs = divmod(rem, 60)
    return "{:0>2}:{:0>2}:{:05.2f}".format(int(hours), int(minutes), secs)


def add_suffix_to_fname(src_fname, suffix):
    base = os.path.basename(src_fname)
    file_id, ext = os.path.splitext(base)
    return src_fname.replace(base, file_id + suffix + ext)


def save_dict_to_json(d, path):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        json.dump(d, f, indent=2)


def load_dict_from_json(path):
    with open(path) as f:
        return json.load(f)


# ----------------------------------------------------------------------
# images
# ----------------------------------------------------------------------


def read_image_size(path, rpc=None):
    """(height, width) without reading pixels (reference: loader.py:37-44).

    Falls back to 2x the RPC row/col offsets when no readable raster exists
    (the bundled test data ships RPC files without the geotiffs)."""
    if os.path.exists(path):
        size = tiffmeta.image_size_from_tiff(path)
        if size is not None:
            return size
        try:
            from PIL import Image

            with Image.open(path) as im:
                return im.height, im.width
        except Exception:
            pass
    if rpc is not None:
        return (
            int(round(2 * float(np.asarray(rpc.row_offset)) + 1)),
            int(round(2 * float(np.asarray(rpc.col_offset)) + 1)),
        )
    raise IOError("cannot determine image size of {}".format(path))


def load_image(path, offset=None, equalize=False):
    """Read a (possibly multiband) image as a 2-D float array
    (reference: loader.py:188-206)."""
    import cv2

    im = cv2.imread(path, cv2.IMREAD_UNCHANGED | cv2.IMREAD_ANYDEPTH)
    if im is None:
        from PIL import Image

        im = np.asarray(Image.open(path))
    im = im.astype(np.float64)
    if im.ndim > 2:
        im = np.mean(im, axis=int(np.argmin(im.shape)))
    if offset is not None:
        y0, x0 = int(offset["row0"]), int(offset["col0"])
        h, w = int(offset["height"]), int(offset["width"])
        im = im[y0 : y0 + h, x0 : x0 + w]
    if equalize:
        im = custom_equalization(im)
    return im


def custom_equalization(im, mask=None, clip=True, percentiles=5):
    """Percentile-clipped 0-255 equalization (reference: loader.py:171-185)."""
    valid = mask > 0 if mask is not None else np.isfinite(im)
    if clip:
        mi, ma = np.percentile(im[valid], (percentiles, 100 - percentiles))
    else:
        mi, ma = im[valid].min(), im[valid].max()
    if ma <= mi:
        ma = mi + 1
    im = np.clip(im, mi, ma)
    return (im - mi) / (ma - mi) * 255.0


def mask_from_polygons(polygons, im_size):
    """Binary mask from polygon list (reference: loader.py:136-151)."""
    import cv2

    img_mask = np.zeros(im_size, np.uint8)
    int_coords = lambda x: np.array(x).round().astype(np.int32)
    exteriors = [int_coords(p.coords) for p in polygons]
    cv2.fillPoly(img_mask, exteriors, 1)
    return img_mask


def get_binary_mask_from_aoi_lonlat_within_image(height, width, geotiff_rpc, aoi_lonlat, alt=0.0):
    """AOI mask inside an image (reference: loader.py:154-168)."""
    import jax.numpy as jnp

    from sat_bundleadjust_tpu.utils.geo import geojson_polygon, geojson_to_polygon

    lons, lats = np.array(aoi_lonlat["coordinates"][0]).T
    alts = np.full(len(lons), float(alt))
    cols, rows = geotiff_rpc.projection(jnp.asarray(lons), jnp.asarray(lats), jnp.asarray(alts))
    poly = geojson_to_polygon(geojson_polygon(np.vstack((np.asarray(cols), np.asarray(rows))).T))
    return mask_from_polygons([poly], (height, width))


# ----------------------------------------------------------------------
# RPCs
# ----------------------------------------------------------------------


def save_rpcs(filenames, rpcs):
    """Reference: loader.py:232-238."""
    for fn, rpc in zip(filenames, rpcs):
        write_rpc_file(rpc, fn)


def load_rpcs_from_dir(image_fnames_list, rpc_dir, suffix="", extension="rpc", verbose=True):
    """Reference: loader.py:241-252."""
    rpcs = []
    for fname in image_fnames_list:
        rpc_basename = "{}.{}".format(get_id(add_suffix_to_fname(fname, suffix)), extension)
        path = os.path.join(rpc_dir, rpc_basename)
        rpcs.append(rpc_from_rpc_file(path))
    if verbose:
        flush_print("Loaded {} rpcs".format(len(image_fnames_list)))
    return rpcs


def rpc_from_geotiff(path):
    """RPC from geotiff tags (replaces rpcm.rpc_from_geotiff)."""
    rpc = tiffmeta.rpc_from_tiff(path)
    if rpc is None:
        raise IOError("no RPC tag found in {}".format(path))
    return rpc


# ----------------------------------------------------------------------
# matrices, pair lists, paths, geojson, ply
# ----------------------------------------------------------------------


def save_projection_matrices(filenames, projection_matrices, crop_offsets):
    """Reference: loader.py:255-268."""
    for fn, P, offset in zip(filenames, projection_matrices, crop_offsets):
        P = np.asarray(P)
        save_dict_to_json(
            {
                "P": [P[0, :].tolist(), P[1, :].tolist(), P[2, :].tolist()],
                "height": int(offset["height"]),
                "width": int(offset["width"]),
                "col_offset": int(offset["col0"]),
                "row_offset": int(offset["row0"]),
            },
            fn,
        )


def save_list_of_pairs(path, list_of_pairs):
    np.save(path, np.array(list_of_pairs))


def load_list_of_pairs(path):
    arr = np.load(path).T.astype(int)
    return list(zip(arr[0], arr[1]))


def save_list_of_paths(path, paths):
    with open(path, "w") as f:
        for p in paths:
            f.write("%s\n" % p)


def load_list_of_paths(path):
    with open(path) as f:
        return [x.strip() for x in f.readlines()]


def save_geojson(path, geojson):
    save_dict_to_json({"coordinates": geojson["coordinates"], "type": "Polygon"}, path)


def load_geojson(path):
    from sat_bundleadjust_tpu.utils.geo import geojson_polygon

    d = load_dict_from_json(path)
    return geojson_polygon(np.array(d["coordinates"][0]))


def write_point_cloud_ply(filename, point_cloud, color=None):
    """Reference: loader.py:384-406."""
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    with open(filename, "w") as f:
        n = point_cloud.shape[0]
        f.write("ply\nformat ascii 1.0\nelement vertex {}\n".format(n))
        f.write("property float x\nproperty float y\nproperty float z\n")
        if color is not None:
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\nproperty uchar alpha\n")
            f.write("element face 0\nproperty list uchar int vertex_indices\n")
        f.write("end_header\n")
        for i in range(n):
            p = point_cloud[i]
            f.write("{} {} {}".format(p[0], p[1], p[2]))
            if color is not None:
                f.write(" {} {} {} 255".format(*color[:3]))
            f.write("\n")


def read_point_cloud_ply(filename):
    """Reference: loader.py:358-381."""
    with open(filename) as f:
        lines = [x.strip() for x in f.readlines()]
    start = lines.index("end_header") + 1
    pts = [[float(v) for v in l.split()[:3]] for l in lines[start:] if l]
    return np.array(pts)


# ----------------------------------------------------------------------
# footprints / aoi
# ----------------------------------------------------------------------


def load_aoi_from_multiple_images(images, verbose=False):
    """Union of all footprints (reference: loader.py:126-133)."""
    from sat_bundleadjust_tpu.utils.geo import combine_lonlat_geojson_borders

    if verbose:
        print("Defined aoi from union of all geotiff footprints")
    return combine_lonlat_geojson_borders([im.lonlat_geojson for im in images])


def save_predefined_matches(input_dir, output_dir):
    """Convert a matches dir to the predefined-matches bundle
    (reference: loader.py:409-424)."""
    import glob
    import shutil

    predefined = os.path.join(output_dir, "predefined_matches")
    os.makedirs(predefined + "/keypoints", exist_ok=True)
    for fn in glob.glob(input_dir + "/features/*.npy"):
        light = np.load(fn)[:, :3]
        np.save(fn.replace(input_dir + "/features/", predefined + "/keypoints/"), light)
    shutil.copyfile(os.path.join(input_dir, "matches.npy"), predefined + "/matches.npy")
    shutil.copyfile(os.path.join(input_dir, "filenames.txt"), predefined + "/filenames.txt")
