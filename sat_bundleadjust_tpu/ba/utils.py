"""Miscellaneous BA utilities.

Covers the reference's bundle_adjust/ba_utils.py: geotiff-tag conversion,
in-place geotiff RPC update (tag 50844 via utils/tiffwrite — the GDAL-free
equivalent of ba_utils.py:42-48), reprojection comparison, relative motion
between projection matrices, matrix/RPC rescaling, overlap AOI
computation. Adjusted RPCs are additionally delivered as .rpc_adj sidecar
files, which is what the reference's own pipeline consumes downstream."""

import numpy as np

from sat_bundleadjust_tpu.utils.tiffwrite import update_geotiff_rpc  # noqa: F401

from sat_bundleadjust_tpu.models.cameras import (
    apply_projection_matrix,
    apply_rpc_projection,
    decompose_perspective_camera,
)
from sat_bundleadjust_tpu.models.rpc import rpc_to_geotiff_dict, scale_rpc
from sat_bundleadjust_tpu.utils import geo as geo_utils

# reference name: rpc_rpcm_to_geotiff_format (ba_utils.py:14-39)
rpc_to_geotiff_format = rpc_to_geotiff_dict

# reference name: rescale_RPC (ba_utils.py:168-187)
rescale_rpc = scale_rpc


def reproject_pts3d(cam_before, cam_after, cam_model, obs2d, pts3d_before, pts3d_after):
    """Project tie points before/after correction and measure errors
    (reference: ba_utils.py:50-105, without the plotting)."""
    import jax.numpy as jnp

    if cam_model == "rpc":
        proj_before = np.asarray(apply_rpc_projection(cam_before, jnp.asarray(pts3d_before)))
        proj_after = np.asarray(apply_rpc_projection(cam_after, jnp.asarray(pts3d_after)))
    else:
        proj_before = np.asarray(apply_projection_matrix(cam_before, pts3d_before))
        proj_after = np.asarray(apply_projection_matrix(cam_after, pts3d_after))
    err_before = np.linalg.norm(proj_before - obs2d, axis=1)
    err_after = np.linalg.norm(proj_after - obs2d, axis=1)
    return proj_before, proj_after, err_before, err_after, None


def project_pts3d(camera, cam_model, pts3d):
    """Reference: ba_utils.py:108-118."""
    import jax.numpy as jnp

    if cam_model == "rpc":
        return np.asarray(apply_rpc_projection(camera, jnp.asarray(pts3d)))
    return np.asarray(apply_projection_matrix(camera, pts3d))


def compute_relative_motion_between_projection_matrices(P1, P2, verbose=False):
    """Relative extrinsics ext2 @ inv(ext1) between two perspective matrices
    (reference: ba_utils.py:121-149)."""
    k1, r1, t1, o1 = decompose_perspective_camera(P1)
    k2, r2, t2, o2 = decompose_perspective_camera(P2)
    ext1 = np.vstack([np.hstack([r1, t1.reshape(3, 1)]), [0, 0, 0, 1]])
    ext2 = np.vstack([np.hstack([r2, t2.reshape(3, 1)]), [0, 0, 0, 1]])
    return ext2 @ np.linalg.inv(ext1)


def rescale_projection_matrix(P, alpha):
    """Reference: ba_utils.py:152-165."""
    return np.diag([alpha, alpha, 1.0]) @ np.asarray(P)


def get_aoi_where_at_least_two_lonlat_geojson_overlap(lonlat_geojson_list):
    """Union of all pairwise footprint intersections
    (reference: ba_utils.py:190-233). With the convex polygon kernel the
    union is approximated by the hull of the intersection polygons."""
    from sat_bundleadjust_tpu.utils.polygons import union_polygon

    utm_zone = geo_utils.utm_zonestring_from_lonlat_geojson(lonlat_geojson_list[0])
    polys = [
        geo_utils.geojson_to_polygon(geo_utils.utm_geojson_from_lonlat_geojson(g))
        for g in lonlat_geojson_list
    ]
    inters = []
    for i in range(len(polys)):
        for j in range(i + 1, len(polys)):
            inter = polys[i].intersection(polys[j])
            if inter.area > 0:
                inters.append(inter)
    if not inters:
        return None
    union = union_polygon(inters)
    utm_geojson = geo_utils.geojson_from_polygon(union)
    return geo_utils.lonlat_geojson_from_utm_geojson(utm_geojson, utm_zone)
