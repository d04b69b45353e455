from constant_ph_tpu.cli import main

main()
