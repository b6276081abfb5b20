"""Host-side data plane: build pipeline, stores, feeders, agent-graph builders."""
