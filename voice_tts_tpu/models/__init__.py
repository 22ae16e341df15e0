"""Model families: GPT acoustic LM, s2mel flow matching, vocoder, conditioning."""
