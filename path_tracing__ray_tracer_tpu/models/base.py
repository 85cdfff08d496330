"""Renderer contract and registry (API parity with reference
``renderers/base_renderer.py:7-51``): ``render() -> PIL.Image`` +
``get_capabilities()``, and a string-keyed factory with self-registration at
import time.
"""
from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Dict, List, Type

from ..core.camera import Camera
from ..core.scene import RenderSettings, Scene


class BaseRenderer(ABC):
    def __init__(self, name: str):
        self.name = name

    @abstractmethod
    def render(self, scene: Scene, camera: Camera, settings: RenderSettings):
        """Render the scene and return a ``PIL.Image``."""

    @abstractmethod
    def get_capabilities(self) -> List[str]:
        """Feature strings this renderer supports."""

    def get_name(self) -> str:
        return self.name

    def supports(self, feature: str) -> bool:
        return feature in self.get_capabilities()


class RendererFactory:
    _renderers: Dict[str, Type[BaseRenderer]] = {}
    _aliases: Dict[str, str] = {}

    @classmethod
    def register(cls, name: str, renderer_class: Type[BaseRenderer]):
        cls._renderers[name] = renderer_class

    @classmethod
    def register_alias(cls, alias: str, target: str):
        """Compatibility names (the reference CLI's ``cuda_*`` renderer names
        map onto their TPU equivalents)."""
        cls._aliases[alias] = target

    @classmethod
    def create(cls, name: str, **kwargs) -> BaseRenderer:
        name = cls._aliases.get(name, name)
        if name not in cls._renderers:
            raise ValueError(f"Unknown renderer: {name}")
        return cls._renderers[name](**kwargs)

    @classmethod
    def list_available(cls) -> List[str]:
        return list(cls._renderers.keys()) + list(cls._aliases.keys())
