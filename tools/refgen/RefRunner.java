// Golden-fixture generator: runs the REFERENCE's own Mapper/Reducer classes
// (compiled transiently from the read-only checkout, never committed) through
// Hadoop's LocalJobRunner on the small-sample fixtures, and dumps each
// step's text output for the engine's byte-parity specs.
//
// Usage: java RefRunner <corpus> <gold> <outBase>
import org.apache.hadoop.conf.Configuration;
import org.apache.hadoop.fs.Path;
import org.apache.hadoop.io.Text;
import org.apache.hadoop.mapreduce.Counter;
import org.apache.hadoop.mapreduce.Job;
import org.apache.hadoop.mapreduce.lib.input.FileInputFormat;
import org.apache.hadoop.mapreduce.lib.input.TextInputFormat;
import org.apache.hadoop.mapreduce.lib.output.FileOutputFormat;
import org.apache.hadoop.mapreduce.lib.output.TextOutputFormat;

import java.io.FileWriter;

public class RefRunner {
    public static void main(String[] args) throws Exception {
        String corpus = args[0], gold = args[1], out = args[2];

        Configuration base = new Configuration();
        base.set("mapreduce.framework.name", "local");
        base.set("fs.defaultFS", "file:///");

        // Step 1: corpus -> tagged counts (combiner = reducer)
        Job j1 = Job.getInstance(new Configuration(base), "Step1");
        j1.setJarByClass(Step1.class);
        j1.setMapperClass(Step1.MapperClass.class);
        j1.setReducerClass(Step1.ReducerClass.class);
        j1.setCombinerClass(Step1.ReducerClass.class);
        j1.setOutputKeyClass(Text.class);
        j1.setOutputValueClass(Text.class);
        j1.setOutputFormatClass(TextOutputFormat.class);
        j1.setInputFormatClass(TextInputFormat.class);
        FileInputFormat.addInputPath(j1, new Path(corpus));
        FileOutputFormat.setOutputPath(j1, new Path(out + "/step1"));
        if (!j1.waitForCompletion(false)) System.exit(1);
        long l = 0, f = 0;
        for (Counter c : j1.getCounters().getGroup("TotalCounters")) {
            if (c.getName().equals("L")) l = c.getValue();
            if (c.getName().equals("F")) f = c.getValue();
        }
        try (FileWriter w = new FileWriter(out + "/counters.txt")) {
            w.write("L " + l + "\nF " + f + "\n");
        }

        // Step 2: counts -> enriched pairs (key-prefix partitioner + sort)
        Job j2 = Job.getInstance(new Configuration(base), "Step2");
        j2.setJarByClass(Step2.class);
        j2.setMapperClass(Step2.MapperClass.class);
        j2.setReducerClass(Step2.ReducerClass.class);
        j2.setPartitionerClass(Step2.PartitionerClass.class);
        j2.setOutputKeyClass(Text.class);
        j2.setOutputValueClass(Text.class);
        j2.setOutputFormatClass(TextOutputFormat.class);
        j2.setInputFormatClass(TextInputFormat.class);
        FileInputFormat.addInputPath(j2, new Path(out + "/step1/part-r*"));
        FileOutputFormat.setOutputPath(j2, new Path(out + "/step2"));
        if (!j2.waitForCompletion(false)) System.exit(2);

        // Step 3: enriched pairs + totals -> association measures
        Configuration c3 = new Configuration(base);
        c3.set("L", String.valueOf(l));
        c3.set("F", String.valueOf(f));
        Job j3 = Job.getInstance(c3, "Step3");
        j3.setJarByClass(Step3.class);
        j3.setMapperClass(Step3.MapperClass.class);
        j3.setReducerClass(Step3.ReducerClass.class);
        j3.setOutputKeyClass(Text.class);
        j3.setOutputValueClass(Text.class);
        j3.setOutputFormatClass(TextOutputFormat.class);
        j3.setInputFormatClass(TextInputFormat.class);
        FileInputFormat.addInputPath(j3, new Path(out + "/step2/part-r*"));
        FileOutputFormat.setOutputPath(j3, new Path(out + "/step3"));
        if (!j3.waitForCompletion(false)) System.exit(3);

        // Step 4: association + gold standard -> 24-dim vectors
        Configuration c4 = new Configuration(base);
        c4.set("goldStandardPath", "file://" + gold);
        Job j4 = Job.getInstance(c4, "Step4");
        j4.setJarByClass(Step4.class);
        j4.setMapperClass(Step4.MapperClass.class);
        j4.setReducerClass(Step4.ReducerClass.class);
        j4.setGroupingComparatorClass(Step4.OriginalKeyGroupingComparator.class);
        j4.setSortComparatorClass(Step4.CompositeKeyComparator.class);
        j4.setPartitionerClass(Step4.PartitionerClass.class);
        j4.setMapOutputKeyClass(Step4.CompositeKey.class);
        j4.setMapOutputValueClass(Text.class);
        j4.setOutputKeyClass(Text.class);
        j4.setOutputValueClass(Text.class);
        j4.setOutputFormatClass(TextOutputFormat.class);
        j4.setInputFormatClass(TextInputFormat.class);
        FileInputFormat.addInputPath(j4, new Path(out + "/step3/part-r*"));
        FileOutputFormat.setOutputPath(j4, new Path(out + "/step4"));
        if (!j4.waitForCompletion(false)) System.exit(4);

        System.out.println("DONE L=" + l + " F=" + f);
    }
}
