from clipa_tpu.train.loop import main

main()
