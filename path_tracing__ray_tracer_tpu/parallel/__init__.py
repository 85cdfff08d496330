"""Multi-chip scaling: device meshes, sharded rendering, progressive
accumulation with checkpoint/resume."""
