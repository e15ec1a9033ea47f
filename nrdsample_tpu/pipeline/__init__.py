"""Frame orchestration: one jitted pure frame function over an explicit history
pytree — the RenderFrame + NRDIntegration replacement (SURVEY.md §3.3, §7.1)."""
