"""Config, dataset IO, synthetic scenes, trajectory export, vocabulary tools."""
