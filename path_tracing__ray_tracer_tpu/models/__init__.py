"""Renderer implementations ("model families") and the factory registry."""
