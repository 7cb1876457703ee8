"""Render engine, camera/settings, frame state."""
