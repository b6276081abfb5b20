"""Model families: retriever (triple scorer), GFlowNet path sampler, reasoner."""
