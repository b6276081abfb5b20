"""Edge-level GFlowNet: env, policy, state encoder, estimator, reward, actor."""
