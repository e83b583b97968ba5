"""Pure-numpy geometry kernels over Arrow-friendly buffers.

The engine's geometry column is WKB ``binary`` (Arrow null = missing
geometry), matching the reference's canonical identity — pygeos hashes
and compares geometries through WKB (src/pygeom.c:236-262). Kernels
parse WKB into the flat columnar :class:`rayspatial.geom.array.GeomArray`
(coords + part offsets, the layout src/coords.c walks) and compute with
vectorized numpy. No GEOS, no shapely — everything from scratch.
"""

# ---------------------------------------------------------------------------
# Flat pygeos-style namespace (reference pygeos/__init__.py:1-20 pulls
# every module's public surface into one namespace) — a user of the
# reference can `from rayspatial import geom as pygeos` and keep the
# same call sites for the implemented surface.

from rayspatial.geom.accessors import (  # noqa: E402,F401
    empty,
    force_2d,
    force_3d,
    get_precision,
    get_srid,
    set_precision,
    set_srid,
    get_coordinate_dimension,
    get_dimensions,
    get_exterior_ring,
    get_geometry,
    get_interior_ring,
    get_num_coordinates,
    get_num_geometries,
    get_num_interior_rings,
    get_num_points,
    get_parts,
    get_point,
    get_rings,
    get_type_id,
    get_x,
    get_y,
    get_z,
)
from rayspatial.geom.array import GeomArray, GeometryType  # noqa: E402,F401
from rayspatial.geom.constructive import (  # noqa: E402,F401
    BufferCapStyles,
    BufferJoinStyles,
    boundary,
    box,
    buffer,
    build_area,
    make_valid,
    centroid,
    clip_by_rect,
    convex_hull,
    envelope,
    extract_unique_points,
    minimum_bounding_circle,
    minimum_rotated_rectangle,
    normalize,
    oriented_envelope,
    point_on_surface,
    reverse,
    segmentize,
    simplify,
    snap,
)
from rayspatial.geom.coordinates import (  # noqa: E402,F401
    apply,
    count_coordinates,
    get_coordinates,
    set_coordinates,
)
from rayspatial.geom.creation import (  # noqa: E402,F401
    collect,
    geometrycollections,
    linearrings,
    linestrings,
    multilinestrings,
    multipoints,
    multipolygons,
    points,
    polygons,
)
from rayspatial.geom.io import (  # noqa: E402,F401
    from_geojson,
    from_wkt,
    to_geojson,
    to_wkt,
)
from rayspatial.geom.linear import (  # noqa: E402,F401
    line_interpolate_point,
    line_locate_point,
    line_merge,
    offset_curve,
    shared_paths,
    shortest_line,
)
from rayspatial.geom.measures import (  # noqa: E402,F401
    area,
    bounds,
    distance,
    frechet_distance,
    hausdorff_distance,
    length,
    minimum_bounding_radius,
    minimum_clearance,
    total_bounds,
)
from rayspatial.geom.predicates import (  # noqa: E402,F401
    contains,
    destroy_prepared,
    is_prepared,
    is_valid_reason,
    prepare,
    relate,
    relate_pattern,
    contains_properly,
    covered_by,
    covers,
    crosses,
    disjoint,
    dwithin,
    equals,
    equals_exact,
    has_z,
    intersects,
    is_ccw,
    is_closed,
    is_empty,
    is_geometry,
    is_missing,
    is_ring,
    is_simple,
    is_valid,
    is_valid_input,
    overlaps,
    touches,
    within,
)
from rayspatial.geom.setops import (  # noqa: E402,F401
    coverage_union,
    coverage_union_all,
    difference,
    intersection,
    intersection_all,
    symmetric_difference,
    symmetric_difference_all,
    union,
    union_all,
)
from rayspatial.geom.polygonize import polygonize, polygonize_full  # noqa: E402,F401
from rayspatial.geom.strtree import STRtree  # noqa: E402,F401
from rayspatial.geom.triangulate import (  # noqa: E402,F401
    delaunay_triangles,
    voronoi_polygons,
)
from rayspatial.geom.wkb import parse_wkb as from_wkb  # noqa: E402,F401
from rayspatial.geom.wkb import to_wkb  # noqa: E402,F401
