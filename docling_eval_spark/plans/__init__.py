"""End-to-end pipelines composing corpus -> extraction -> scoring -> rollups."""
