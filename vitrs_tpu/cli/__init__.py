"""Console entry points (`vitrs-train`, `vitrs-infer`, `vitrs-pretrain-mae`)
— the train/eval CLI layer the reference never shipped (gap G1, SURVEY.md
§2.9); packaged so an installed `vitrs_tpu` exposes them from any cwd."""
