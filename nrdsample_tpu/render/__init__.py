"""Render passes: primary G-buffer, opaque path tracing, transparent glass pass,
lighting, composition inputs. The Shaders/*.cs.hlsl layer re-designed as pure
batched functions (SURVEY.md §2.2)."""
