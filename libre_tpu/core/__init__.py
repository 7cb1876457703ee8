"""Core octree data model, LOD selection, frustum math, caches, configuration."""
