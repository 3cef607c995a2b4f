checkpoint_config = dict(interval=1)
log_config = dict(interval=50)
log_level = 'INFO'
load_from = None
resume_from = None
