"""HatefulDiscussions experiment: dataset ingestion + registered factory
(reference: mDT/experiments/hateful_discussions/)."""
