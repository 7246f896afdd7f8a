// Interop harness: decodes a word stream with the *reference*
// gorilla-tsc decompressor. Used by verification to prove streams
// produced by our Python encoder are readable by the reference.
//
// Usage: java RefDecode <mode:v2|v1|dfcm:N> < stream.txt
//   v2 stdin: first line = space-separated signed long words
//   v1 stdin: first line = hex bytes
//   dfcm:N: like v2, decoded with a DifferentialFCM(N) predictor
//   stdout: one "ts value" line per pair.

import java.io.BufferedReader;
import java.io.InputStreamReader;
import java.nio.ByteBuffer;

import fi.iki.yak.ts.compression.gorilla.ByteBufferBitInput;
import fi.iki.yak.ts.compression.gorilla.Decompressor;
import fi.iki.yak.ts.compression.gorilla.GorillaDecompressor;
import fi.iki.yak.ts.compression.gorilla.LongArrayInput;
import fi.iki.yak.ts.compression.gorilla.Pair;

public class RefDecode {
    public static void main(String[] args) throws Exception {
        BufferedReader r = new BufferedReader(new InputStreamReader(System.in));
        String line = r.readLine().trim();
        StringBuilder sb = new StringBuilder();
        if (args[0].equals("v2") || args[0].startsWith("dfcm:")) {
            String[] parts = line.split("\\s+");
            long[] words = new long[parts.length];
            for (int i = 0; i < parts.length; i++) words[i] = Long.parseLong(parts[i]);
            GorillaDecompressor d = args[0].equals("v2")
                ? new GorillaDecompressor(new LongArrayInput(words))
                : new GorillaDecompressor(new LongArrayInput(words),
                    new fi.iki.yak.ts.compression.gorilla.predictors.DifferentialFCM(
                        Integer.parseInt(args[0].substring(5))));
            Pair p;
            while ((p = d.readPair()) != null)
                sb.append(p.getTimestamp()).append(' ').append(p.getLongValue()).append('\n');
        } else {
            byte[] data = new byte[line.length() / 2];
            for (int i = 0; i < data.length; i++)
                data[i] = (byte) Integer.parseInt(line.substring(2 * i, 2 * i + 2), 16);
            Decompressor d = new Decompressor(new ByteBufferBitInput(ByteBuffer.wrap(data)));
            Pair p;
            while ((p = d.readPair()) != null)
                sb.append(p.getTimestamp()).append(' ').append(p.getLongValue()).append('\n');
        }
        System.out.print(sb);
    }
}
