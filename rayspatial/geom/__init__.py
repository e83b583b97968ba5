"""Pure-numpy geometry kernels over Arrow-friendly buffers.

The engine's geometry column is WKB ``binary`` (Arrow null = missing
geometry), matching the reference's canonical identity — pygeos hashes
and compares geometries through WKB (src/pygeom.c:236-262). Kernels
parse WKB into the flat columnar :class:`rayspatial.geom.array.GeomArray`
(coords + part offsets, the layout src/coords.c walks) and compute with
vectorized numpy. No GEOS, no shapely — everything from scratch.
"""
